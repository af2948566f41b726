"""Sparse TF-IDF cosine pair join — python replay, cap semantics."""

import itertools
import math

import pytest

from linkgraph.pipeline.similarity import tfidf_cosine_pairs


def _replay(docs, max_df=None):
    N = len(docs)
    tf = {}
    for d, text in docs:
        words = [t for t in text.split() if t]
        if words:
            counts = {}
            for t in words:
                counts[t] = counts.get(t, 0) + 1
            tf[d] = counts
    dfq = {}
    for counts in tf.values():
        for t in counts:
            dfq[t] = dfq.get(t, 0) + 1
    w = {
        d: {t: c * math.log(N / dfq[t]) for t, c in counts.items()}
        for d, counts in tf.items()
    }
    exp = {}
    for a, b in itertools.combinations(sorted(w), 2):
        shared = set(w[a]) & set(w[b])
        if max_df is not None:
            shared = {t for t in shared if dfq[t] <= max_df}
        if not shared:
            continue
        dot = sum(w[a][t] * w[b][t] for t in shared)
        na = math.sqrt(sum(x * x for x in w[a].values()))
        nb = math.sqrt(sum(x * x for x in w[b].values()))
        exp[(a, b)] = dot / (na * nb)
    return exp


DOCS = [
    (1, "apple banana apple cherry"),
    (2, "apple banana"),
    (3, "cherry date banana"),
    (4, "elder fig"),
    (5, ""),
]


def test_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {(r["d1"], r["d2"]): r["sim"] for r in tfidf_cosine_pairs(df).collect()}
    exp = _replay(DOCS)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12)


def test_max_df_drops_join_terms_but_keeps_norms(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["d1"], r["d2"]): r["sim"]
        for r in tfidf_cosine_pairs(df, max_df=2).collect()
    }
    exp = _replay(DOCS, max_df=2)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12)


def test_min_sim_filters(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    all_pairs = tfidf_cosine_pairs(df).collect()
    hi = tfidf_cosine_pairs(df, min_sim=0.5).collect()
    assert {tuple(r[:2]) for r in hi} == {
        (r["d1"], r["d2"]) for r in all_pairs if r["sim"] >= 0.5
    }


def test_identical_docs_sim_one(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "q")], ["doc_id", "text"]
    )
    got = {(r["d1"], r["d2"]): r["sim"] for r in tfidf_cosine_pairs(df).collect()}
    assert got[(1, 2)] == pytest.approx(1.0)
