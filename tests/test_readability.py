"""readability_scores: hand-computed Flesch closed forms, degenerate
inputs, python replay of the syllable heuristic."""

import re

import pytest

from linkgraph.pipeline.text import readability_scores


def _score(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return readability_scores(df).collect()[0]


def _py_replay(text):
    t = text.lower()
    words = [w for w in re.split(r"[^a-z0-9']+", t) if w]
    sents = [s for s in re.split(r"[.!?]+", t) if re.search(r"[a-z0-9]", s)]
    syl = sum(max(len(re.findall(r"[aeiouy]+", w)), 1) for w in words)
    if not words or not sents:
        return 0, 0, 0, 0.0, 0.0
    wps, spw = len(words) / len(sents), syl / len(words)
    return (
        len(words),
        len(sents),
        syl,
        206.835 - 1.015 * wps - 84.6 * spw,
        0.39 * wps + 11.8 * spw - 15.59,
    )


def test_closed_form(spark):
    r = _score(spark, "The cat sat on the mat. It was happy!")
    assert (r["r_words"], r["r_sentences"], r["r_syllables"]) == (9, 2, 10)
    assert r["r_flesch"] == pytest.approx(206.835 - 1.015 * 4.5 - 84.6 * (10 / 9))
    assert r["r_fk_grade"] == pytest.approx(0.39 * 4.5 + 11.8 * (10 / 9) - 15.59)


@pytest.mark.parametrize(
    "text",
    [
        "Dr. Smith went home... He said: 'hello world'! Why?",
        "ONE two THREE. four five six? seven!!!",
        "a.b.c.d",
        "queueing rhythms fly by",
        "  leading spaces. trailing!  ",
    ],
)
def test_python_replay(spark, text):
    r = _score(spark, text)
    w, s, sy, fl, fk = _py_replay(text)
    assert (r["r_words"], r["r_sentences"], r["r_syllables"]) == (w, s, sy)
    assert r["r_flesch"] == pytest.approx(fl, abs=1e-9)
    assert r["r_fk_grade"] == pytest.approx(fk, abs=1e-9)


def test_degenerate_inputs(spark):
    for text in ("", "   ", "?!?!", "..."):
        r = _score(spark, text)
        assert r["r_words"] == 0 and r["r_flesch"] == 0.0 and r["r_fk_grade"] == 0.0


def test_no_vowel_word_counts_one_syllable(spark):
    # "tsk tsk" — the max(…, 1) floor
    r = _score(spark, "tsk tsk.")
    assert r["r_syllables"] == 2 and r["r_words"] == 2
