"""Round-4 text operators: repetition stats, top n-grams, TF-IDF, and
benchmark decontamination — closed-form fixtures where the right answer is
computable by hand."""

import math

import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline.text import (
    decontaminate,
    repetition_stats,
    tfidf_top_terms,
    top_ngrams,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b c"),          # 5 words, 3 distinct; bigrams: ab ba ab bc
            (2, "x x x"),              # total repetition
            (3, ""),                   # empty
            (4, "unique words only"),  # no repetition
        ],
        ["doc_id", "text"],
    )


def test_repetition_stats_closed_form(spark, docs):
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 1: 5 words, 3 distinct -> 2/5; bigrams [a b, b a, a b, b c]:
    # 4 total, 3 distinct -> 1/4; trigrams all distinct -> 0
    assert rows[1]["n_words"] == 5
    assert rows[1]["dup_1gram_frac"] == pytest.approx(2 / 5)
    assert rows[1]["dup_2gram_frac"] == pytest.approx(1 / 4)
    assert rows[1]["dup_3gram_frac"] == pytest.approx(0.0)
    # doc 2: x x x -> 2/3 words dup, bigrams [x x, x x] -> 1/2, 1 trigram -> 0
    assert rows[2]["dup_1gram_frac"] == pytest.approx(2 / 3)
    assert rows[2]["dup_2gram_frac"] == pytest.approx(1 / 2)
    assert rows[2]["dup_3gram_frac"] == pytest.approx(0.0)
    # empty doc: all zeros, not null/NaN
    assert rows[3]["n_words"] == 0
    assert rows[3]["dup_1gram_frac"] == 0.0
    assert rows[4]["dup_1gram_frac"] == 0.0


def test_top_ngrams(spark, docs):
    out = top_ngrams(docs, n=2, k=3).collect()
    # 'a b' (doc 1) and 'x x' (doc 2) each occur twice; count desc then
    # gram asc pins the full order
    assert [(r["gram"], r["count"]) for r in out[:2]] == [("a b", 2), ("x x", 2)]
    assert out[2]["count"] == 1


def test_tfidf_scores_and_ties(spark):
    d = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(d, k=2)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    # doc 1: apple tf=2 df=1 -> 2 ln 3 ; banana tf=1 df=2 -> ln 1.5
    assert rows[(1, 1)]["term"] == "apple"
    assert rows[(1, 1)]["score"] == pytest.approx(2 * math.log(3))
    assert rows[(1, 2)]["term"] == "banana"
    assert rows[(1, 2)]["score"] == pytest.approx(math.log(1.5))
    # doc 2: banana and cherry both tf=1 df=2 -> equal scores, term asc
    assert rows[(2, 1)]["term"] == "banana"
    assert rows[(2, 2)]["term"] == "cherry"


def test_tfidf_no_corpus_window(spark, docs):
    # per-doc ranking must be the doc-bounded aggregate, not a Window
    plan = tfidf_top_terms(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_decontaminate_string_and_hashed_agree(spark):
    train = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "completely unrelated content here today"),
            (12, "quick brown fox jumps high"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(99, "we saw the quick brown fox jumps yesterday")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["n_shared_grams"] for r in decontaminate(train, ev, n=4).collect()}
    # shared 4-grams with eval: doc 10 has 'the quick brown fox',
    # 'quick brown fox jumps'; doc 12 has 'quick brown fox jumps'; doc 11 none
    assert out == {10: 2, 12: 1}
    hashed = {
        r["doc_id"]: r["n_shared_grams"]
        for r in decontaminate(train, ev, n=4, hashed=True).collect()
    }
    assert hashed == out


def test_decontaminate_broadcasts_eval(spark):
    train = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    ev = spark.createDataFrame([(2, "b c d e f")], ["doc_id", "text"])
    plan = (
        decontaminate(train, ev, n=4)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------- sampling


def _md5_bucket(*parts):
    import hashlib

    return hashlib.md5("\x1f".join(parts).encode()).hexdigest()[:8]


def test_stratified_sample_replay_and_invariance(spark):
    from linkgraph.pipeline.sampling import stratified_sample

    rows = [(i, "en" if i % 3 else "fr") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_sample(df, 4, ["lang"], ["doc_id"], seed=13)
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}
    # python replay of the exact priority order
    expect = set()
    for lang in ("en", "fr"):
        members = [(i, l) for i, l in rows if l == lang]
        members.sort(key=lambda t: (_md5_bucket(str(t[0]), "13"), t[0]))
        expect |= set(members[:4])
    assert got == expect
    # partitioning-independent
    got2 = {
        (r["doc_id"], r["lang"])
        for r in stratified_sample(
            df.repartition(7), 4, ["lang"], ["doc_id"], seed=13
        ).collect()
    }
    assert got2 == got
    # small strata kept whole
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], ["doc_id", "lang"])
    assert stratified_sample(tiny, 5, ["lang"], ["doc_id"]).count() == 2


def test_weighted_sample_replay_and_bias(spark):
    import math

    from linkgraph.pipeline.sampling import weighted_sample

    rows = [(i, float(1 + (i % 10) * 100)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_sample(df, 20, "w", ["doc_id"], seed=7)
    got = [r["doc_id"] for r in out.collect()]
    # python replay: pri = ln((n+1)/2^32)/w, top-20 desc
    def pri(i, w):
        n = int(_md5_bucket(str(i), "7"), 16)
        return math.log((n + 1) / 4294967296.0) / w

    expect = sorted(rows, key=lambda t: (-pri(*t), t[0]))[:20]
    assert set(got) == {i for i, _ in expect}
    # bias: heavy rows (w >= 501) are 50% of mass-bearing rows but should
    # dominate the sample
    heavy = sum(1 for i in got if (i % 10) >= 5)
    assert heavy > 13
    # zero/negative weights excluded
    z = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], ["doc_id", "w"])
    assert [r["doc_id"] for r in weighted_sample(z, 3, "w", ["doc_id"]).collect()] == [3]


def test_temperature_sample_replay_and_rebalance(spark):
    import math

    from linkgraph.pipeline.sampling import temperature_sample

    # 180 en / 18 fr / 2 de: a skewed "language" mix
    rows = (
        [(i, "en") for i in range(180)]
        + [(1000 + i, "fr") for i in range(18)]
        + [(2000, "de"), (2001, "de")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_sample(df, 60, "lang", ["doc_id"], alpha=0.5, seed=3)
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}

    # exact python replay: quantized sqrt weights -> per-group thresholds
    counts = {}
    for _, l in rows:
        counts[l] = counts.get(l, 0) + 1
    w = {l: math.floor(math.sqrt(float(c)) * (1 << 20)) for l, c in counts.items()}
    W = sum(w.values())
    th = {
        l: min(
            2**32,
            math.floor(60.0 * float(w[l]) / float(W) / float(counts[l]) * float(2**32)),
        )
        for l in counts
    }
    expect = {
        (i, l) for i, l in rows if int(_md5_bucket(str(i), "3"), 16) < th[l]
    }
    assert got == expect and got  # non-empty

    # partitioning-independent
    got2 = {
        (r["doc_id"], r["lang"])
        for r in temperature_sample(
            df.repartition(7), 60, "lang", ["doc_id"], alpha=0.5, seed=3
        ).collect()
    }
    assert got2 == got

    # rebalance direction: at alpha=0.5 the tail's share of the sample
    # budget exceeds its natural share (fr is 9% of rows, but its expected
    # rate n*w_fr/W/c_fr is ~3x the proportional rate)
    nat_fr = counts["fr"] / len(rows)
    quota_share_fr = (th["fr"] / 2**32) * counts["fr"] / 60.0
    assert quota_share_fr > nat_fr

    # alpha=1 ~ proportional: every group gets (near-)identical rate
    out1 = temperature_sample(df, 60, "lang", ["doc_id"], alpha=1.0, seed=3)
    w1 = {l: math.floor(float(c) * (1 << 20)) for l, c in counts.items()}
    W1 = sum(w1.values())
    th1 = {
        l: min(
            2**32,
            math.floor(
                60.0 * float(w1[l]) / float(W1) / float(counts[l]) * float(2**32)
            ),
        )
        for l in counts
    }
    expect1 = {(i, l) for i, l in rows if int(_md5_bucket(str(i), "3"), 16) < th1[l]}
    assert {(r["doc_id"], r["lang"]) for r in out1.collect()} == expect1
    rates1 = {l: th1[l] / 2**32 for l in counts}
    assert max(rates1.values()) - min(rates1.values()) < 1e-6

    # n_rows >= total saturates every rate at 1: everything kept
    assert temperature_sample(df, 10_000, "lang", ["doc_id"]).count() == len(rows)
    # n_rows = 0 drops everything
    assert temperature_sample(df, 0, "lang", ["doc_id"]).count() == 0


def test_trailing_whitespace_no_phantom_tokens(spark):
    # review regression: F.trim strips only spaces, so a newline-terminated
    # doc used to grow a phantom '' token (n_words=3, bogus ' '-grams)
    d = spark.createDataFrame(
        [(1, "hello world\n"), (2, "\n"), (3, "\ta b\t"), (4, " x  y ")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    assert rows[1]["n_words"] == 2 and rows[1]["dup_1gram_frac"] == 0.0
    assert rows[2]["n_words"] == 0 and rows[2]["dup_1gram_frac"] == 0.0
    assert rows[3]["n_words"] == 2 and rows[4]["n_words"] == 2
    grams = [r["gram"] for r in top_ngrams(d, n=2, k=10).collect()]
    assert all(" " != g.strip()[-1:] and "" not in g.split(" ") for g in grams)
    from linkgraph.pipeline.text import token_count

    counts = {
        r["doc_id"]: r["n_tokens"] for r in token_count(d).collect()
    }
    assert counts == {1: 2, 2: 0, 3: 2, 4: 2}


def test_unigram_logprob_closed_form(spark):
    import math

    from linkgraph.pipeline.text import unigram_logprob

    # corpus: 'a a b' + 'b c' -> counts a:2 b:2 c:1, N=5, V=3, a=1 -> z=8
    d = spark.createDataFrame([(1, "a a b"), (2, "b c")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in unigram_logprob(d).collect()}
    la, lb, lc = (math.log(x / 8) for x in (3.0, 3.0, 2.0))
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["mean_logprob"] == pytest.approx((la + la + lb) / 3)
    assert rows[2]["mean_logprob"] == pytest.approx((lb + lc) / 2)
    # scoring against a separate reference: OOV gets the smoothed floor
    q = spark.createDataFrame([(9, "a zzz")], ["doc_id", "text"])
    [r] = unigram_logprob(q, reference=d).collect()
    assert r["mean_logprob"] == pytest.approx((la + math.log(1 / 8)) / 2)
    # gibberish scores lower than in-vocabulary text
    gib = spark.createDataFrame([(1, "a b"), (2, "zz qq")], ["doc_id", "text"])
    s = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob(gib, reference=d).collect()}
    assert s[2] < s[1]
    with pytest.raises(ValueError):
        unigram_logprob(d, smoothing=0.0)


def test_chunk_documents_windows(spark):
    from linkgraph.pipeline.text import chunk_documents

    d = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    rows = sorted(
        chunk_documents(d, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: (r["doc_id"], r["chunk"]),
    )
    got = [(r["doc_id"], r["chunk"], r["text"]) for r in rows]
    # stride 3: starts 1,4,7 -> [w1-4],[w4-7],[w7-10]; doc2 one short chunk;
    # empty doc emits nothing
    assert got == [
        (1, 0, "w1 w2 w3 w4"),
        (1, 1, "w4 w5 w6 w7"),
        (1, 2, "w7 w8 w9 w10"),
        (2, 0, "a b"),
    ]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4, 2]
    # no-overlap exact tiling
    tiles = chunk_documents(d.filter("doc_id = 1"), 5, 0).collect()
    assert sorted(r["text"] for r in tiles) == [
        "w1 w2 w3 w4 w5",
        "w6 w7 w8 w9 w10",
    ]
    # every word of the doc appears in some chunk (coverage law)
    covered = set()
    for r in rows:
        if r["doc_id"] == 1:
            covered.update(r["text"].split(" "))
    assert covered == {f"w{i}" for i in range(1, 11)}
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents(d, 0)
    with _pt.raises(ValueError):
        chunk_documents(d, 4, overlap=4)


def test_quality_filter_rules_and_order(spark):
    from linkgraph.pipeline.text import quality_filter

    d = spark.createDataFrame(
        [
            (1, " ".join(f"word{i}" for i in range(15))),  # varied, passes
            (2, "short"),                           # too few words
            (3, "spam spam " * 20),                 # repetitive bigrams
            (4, "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) ___"),  # low alpha
            (5, " ".join("x" * 80 + str(i) for i in range(12))),  # huge words
        ],
        ["doc_id", "text"],
    )
    out = quality_filter(
        d, min_words=10, max_dup_2gram=0.3, min_alpha_ratio=0.5,
        max_word_len_mean=40.0,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["keep"] and rows[1]["drop_reason"] is None
    assert rows[2]["drop_reason"] == "too_few_words"
    assert rows[3]["drop_reason"] == "repetitive"
    assert rows[4]["drop_reason"] == "low_alpha_ratio"
    assert rows[5]["drop_reason"] == "words_too_long"
    assert not any(rows[i]["keep"] for i in (2, 3, 4, 5))
    # rule order is fixed: a doc failing several rules reports the FIRST
    tiny_junk = spark.createDataFrame([(9, "@@ ##")], ["doc_id", "text"])
    [r] = quality_filter(tiny_junk, min_words=10).collect()
    assert r["drop_reason"] == "too_few_words"
    # pure column math: no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_pii_scrub_types_order_and_nulls(spark):
    from linkgraph.pipeline.text import pii_scrub

    d = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@my-site.org today"),
            (2, "see https://ex.org/u?e=a@b.com then mail c@d.net"),
            (3, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.3"),
            (4, "card 4111 1111 1111 1111 and 4111-1111-1111-1111"),
            (5, None),
            (6, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_scrub(d).collect()}
    assert rows[1]["pii_email"] == 1
    assert rows[1]["redacted"] == "mail me at <EMAIL> today"
    # URL rule consumes the embedded email in REDACTION (fixed order), but
    # counts are computed independently on the original text
    assert rows[2]["pii_url"] == 1 and rows[2]["pii_email"] == 2
    assert rows[2]["redacted"] == "see <URL> then mail <EMAIL>"
    assert rows[3]["pii_ssn"] == 1 and rows[3]["pii_phone"] == 1
    assert rows[3]["pii_ipv4"] == 1
    assert rows[3]["redacted"] == "ssn <SSN> phone <PHONE> ip <IPV4>"
    assert rows[4]["pii_card"] == 2
    assert rows[4]["redacted"] == "card <CARD> and <CARD>"
    # null text: zero counts, null redacted (no ANSI null poisoning)
    assert rows[5]["pii_email"] == 0 and rows[5]["redacted"] is None
    assert rows[6]["redacted"] == "no pii here at all"
    # scan-shaped: no shuffle, no Python in the plan
    plan = pii_scrub(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_bm25_ranking_semantics(spark):
    import pytest as _pt

    from linkgraph.pipeline.text import bm25_search

    d = spark.createDataFrame(
        [
            (1, "spark spark spark join"),      # high tf for 'spark'
            (2, "spark join " + "pad " * 50),   # long doc penalized by b
            (3, "join merge filter"),           # no query term
            (4, "spark"),                       # short doc, tf 1
        ],
        ["doc_id", "text"],
    )
    out = bm25_search(d, ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids              # docs without the term never score
    assert ids[0] == 1               # tf 3 in a short doc wins
    assert ids.index(4) < ids.index(2)  # length normalization bites doc 2
    assert all(r["bm25"] > 0 for r in out)
    with _pt.raises(ValueError):
        bm25_search(d, [])


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_exact_vs_bruteforce(spark):
    import random

    import pytest as _pt

    from linkgraph.pipeline.text import fuzzy_join

    rng = random.Random(77)
    base = ["spark", "graph", "table", "merge", "query", "scan", "row",
            "joint", "window", "a", "ab", "abc"]
    vals = set(base)
    for w in base:  # mutations at distance 1-2
        for _ in range(3):
            i = rng.randrange(len(w))
            vals.add(w[:i] + rng.choice("abcxyz") + w[i + 1:])   # sub
            vals.add(w[:i] + w[i + 1:])                          # del
            vals.add(w[:i] + rng.choice("qz") + w[i:])           # ins
    vals = sorted(v for v in vals if v)
    df = spark.createDataFrame([(v,) for v in vals], ["name"])
    for k in (1, 2):
        got = {
            (r["l"], r["r"]): r["dist"]
            for r in fuzzy_join(df, df, "name", max_dist=k).collect()
        }
        want = {
            (x, y): _lev(x, y)
            for x in vals
            for y in vals
            if x != y and _lev(x, y) <= k
        }
        assert got == want, (k, len(got), len(want))
    with _pt.raises(ValueError):
        fuzzy_join(df, df, "name", max_dist=-1)


def test_fuzzy_join_hot_gram_cap_counts_both_sides(spark):
    """max_gram_freq must count gram frequency over left+right combined: a
    gram rare on the left but flooding the right is exactly the stopword
    blow-up the cap exists to bound, so pairs whose every shared gram is
    right-side-hot are (documented recall cost) dropped."""
    import string

    from linkgraph.pipeline.text import fuzzy_join

    left = spark.createDataFrame([("axxb",)], ["w"])
    # 33 right values 'cxxb': grams xx and xb occur 34x combined, cx once each
    chars = [c for c in string.ascii_lowercase + string.digits if c not in "ax"]
    right = spark.createDataFrame([(f"{c}xxb",) for c in chars], ["w"])

    uncapped = fuzzy_join(left, right, "w", max_dist=1)
    assert uncapped.count() == len(chars)  # every pair is at distance 1

    capped = fuzzy_join(left, right, "w", max_dist=1, max_gram_freq=5)
    # both shared grams (xx, xb) exceed the cap on the RIGHT side only; a
    # left-only count would keep them and return all pairs again
    assert capped.count() == 0


def test_bigram_pmi_closed_form(spark):
    """4-doc fixture: 'new york' occurs 3x of 10 bigrams, 'new'/'york' 3x
    of 14 unigrams each — pmi = ln((3/10)/((3/14)^2)); hapax pairs die by
    min_count; ties sort (pmi desc, w1, w2)."""
    import math

    import pytest as _pt

    from linkgraph.pipeline.text import bigram_pmi

    docs = spark.createDataFrame(
        [
            (1, "new york is big"),
            (2, "new york is old"),
            (3, "big apple new york"),
            (4, "old city"),
        ],
        ["doc_id", "text"],
    )
    rows = bigram_pmi(docs, min_count=2, k=10).collect()
    got = [(r["w1"], r["w2"], r["c_ab"], r["pmi"]) for r in rows]
    p = round(math.log((3 / 10) / ((3 / 14) * (3 / 14))), 6)
    p2 = round(math.log((2 / 10) / ((3 / 14) * (2 / 14))), 6)
    assert got == [("new", "york", 3, p), ("york", "is", 2, p2)]
    # min_count=1 admits the hapax pairs too
    assert bigram_pmi(docs, min_count=1, k=100).count() == 7
    with _pt.raises(ValueError):
        bigram_pmi(docs, min_count=0)
