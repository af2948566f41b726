"""prefix_jaccard_join: lossless-vs-brute-force equality (the whole point
of prefix filtering is exactness), hub-token immunity, validation."""

import itertools

import pytest

from linkgraph.pipeline.dedup import prefix_jaccard_join


def _brute(docs, t):
    toks = {i: set(s.split()) for i, s in docs}
    out = {}
    for a, b in itertools.combinations(sorted(toks), 2):
        ix = len(toks[a] & toks[b])
        if ix == 0:
            continue
        j = ix / (len(toks[a]) + len(toks[b]) - ix)
        if j >= t:
            out[(a, b)] = j
    return out


@pytest.fixture(scope="module")
def docs():
    # every doc shares the boilerplate token "the" (a hub that a naive
    # token self-join would explode on); real similarity varies
    base = ["alpha beta gamma delta", "alpha beta gamma epsilon",
            "zeta eta theta iota", "zeta eta theta kappa",
            "alpha zeta mu nu xi", "omicron pi rho sigma tau",
            "alpha beta gamma delta epsilon", "mu nu xi omicron pi"]
    return [(i, s + " the") for i, s in enumerate(base * 3, start=0)][:24] + [
        (100 + i, f"uniq{i} the") for i in range(6)
    ]


@pytest.mark.parametrize("t", [0.3, 0.5, 0.8, 1.0])
def test_prefix_jaccard_equals_brute(spark, docs, t):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in prefix_jaccard_join(df, t).collect()
    }
    assert got == _brute(docs, t)  # lossless AND exact doubles


def test_prefix_jaccard_prefix_excludes_hub_token(spark, docs):
    # with t=0.5 the global rarest-first ranking puts "the" (df = all
    # docs) last in every doc's ranking, so it never enters any prefix:
    # verified structurally by checking the operator's own prefix table
    # would not be needed -- here we just confirm the hub-only pairs
    # (uniq docs share ONLY "the", J = 1/(1+1+... ) < 0.5) are absent
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["a"], r["b"]) for r in prefix_jaccard_join(df, 0.5).collect()}
    assert not any(a >= 100 and b >= 100 for a, b in got)


def test_prefix_jaccard_validation(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        prefix_jaccard_join(df, 0.0)
    with pytest.raises(ValueError):
        prefix_jaccard_join(df, 1.5)
    # identical docs at t=1.0
    df2 = spark.createDataFrame([(1, "x y z"), (2, "z y x")], ["doc_id", "text"])
    rows = prefix_jaccard_join(df2, 1.0).collect()
    assert [(r["a"], r["b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]
