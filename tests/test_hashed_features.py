"""Feature-hashing vectorizer — md5 replay, signed trick, edge cases."""

import hashlib

import pytest

from linkgraph.pipeline.text import hashed_features


def _bucket(term, d):
    return int(hashlib.md5(term.encode()).hexdigest()[:12], 16) % d


def _sign(term):
    return 1 if hashlib.md5(f"sign:{term}".encode()).hexdigest()[0] < "8" else -1


def test_counts_match_python_replay(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, ""), (3, "b  b\nb")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["bucket"]): r["value"]
        for r in hashed_features(df, n_features=16).collect()
    }
    exp = {
        (1, _bucket("a", 16)): 2,
        (1, _bucket("b", 16)): 1,
        (1, _bucket("c", 16)): 1,
        (3, _bucket("b", 16)): 3,
    }
    assert got == exp


def test_signed_matches_python_replay(spark):
    words = "alpha beta gamma delta epsilon zeta".split()
    df = spark.createDataFrame([(1, " ".join(words * 2))], ["doc_id", "text"])
    got = {
        (r["doc_id"], r["bucket"]): r["value"]
        for r in hashed_features(df, n_features=8, signed=True).collect()
    }
    exp = {}
    for t in words * 2:
        k = (1, _bucket(t, 8))
        exp[k] = exp.get(k, 0) + _sign(t)
    assert got == exp  # zero-sum buckets kept on both sides


def test_blank_doc_produces_no_rows(spark):
    df = spark.createDataFrame([(1, "   \n\t ")], ["doc_id", "text"])
    assert hashed_features(df, n_features=4).count() == 0


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3} common") for i in range(40)], ["doc_id", "text"]
    )
    a = sorted(map(tuple, hashed_features(df.repartition(1), 32).collect()))
    b = sorted(map(tuple, hashed_features(df.repartition(11), 32).collect()))
    assert a == b


def test_invalid_n_features_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        hashed_features(df, n_features=0)
