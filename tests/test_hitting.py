"""Hitting times / absorption probabilities: closed forms, a python
replay of the superstep, and convergence/guard behavior."""

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph, absorption_probabilities, hitting_times


def _g(spark, pairs, directed=True, weights=None):
    if weights:
        rows = [(a, b, w) for (a, b), w in zip(pairs, weights)]
        df = spark.createDataFrame(rows, ["src", "dst", "weight"])
    else:
        df = spark.createDataFrame(pairs, ["src", "dst"])
    return LinkGraph(df, keys={"directed": directed})


def test_chain_hitting_closed_form(spark):
    # directed chain a->b->c->t: deterministic walk, h = distance
    g = _g(spark, [("a", "b"), ("b", "c"), ("c", "t")])
    res = hitting_times(g, ["t"], max_iter=50, tol=1e-12)
    got = {r["id"]: r["hitting_time"] for r in res.values.collect()}
    assert res.converged
    assert got == pytest.approx({"a": 3.0, "b": 2.0, "c": 1.0, "t": 0.0})


def test_two_sided_random_walk(spark):
    # undirected path t - a - b with target t: from a, h = E steps of the
    # symmetric walk; closed form for path of length 2 reflecting at b:
    # h(a) = 1 + h(b)/2, h(b) = 1 + h(a)  ->  h(a) = 3, h(b) = 4... wait
    # h(a) = 1 + (h(t) + h(b))/2 = 1 + h(b)/2; h(b) = 1 + h(a)
    # => h(a) = 1 + (1 + h(a))/2 => h(a)/2 = 1.5 => h(a)=3, h(b)=4
    g = _g(spark, [("t", "a"), ("a", "b")], directed=False)
    res = hitting_times(g, ["t"], max_iter=400, tol=1e-9)
    got = {r["id"]: r["hitting_time"] for r in res.values.collect()}
    assert res.converged
    assert got["a"] == pytest.approx(3.0, abs=1e-6)
    assert got["b"] == pytest.approx(4.0, abs=1e-6)


def test_unreachable_does_not_converge_and_absorption_flags_it(spark):
    # x -> y component cannot reach t; z -> t can
    g = _g(spark, [("x", "y"), ("y", "x"), ("z", "t")])
    res = hitting_times(g, ["t"], max_iter=30, tol=1e-9)
    assert not res.converged
    a = absorption_probabilities(g, ["t"], max_iter=200, tol=1e-12)
    got = {r["id"]: r["absorption_prob"] for r in a.values.collect()}
    assert got["z"] == pytest.approx(1.0)
    assert got["t"] == pytest.approx(1.0)
    assert got["x"] == pytest.approx(0.0, abs=1e-9)
    assert got["y"] == pytest.approx(0.0, abs=1e-9)


def test_gamblers_ruin_absorption(spark):
    # 0 - 1 - 2 - 3 path, target {0}: symmetric walk with reflecting end
    # at 3 reaches 0 with probability 1; with BOTH ends absorbing {0, 3},
    # classic ruin: P(hit 0 before 3 | start i) = (3 - i)/3
    g = _g(spark, [("0", "1"), ("1", "2"), ("2", "3")], directed=False)
    both = absorption_probabilities(g, ["0", "3"], max_iter=300, tol=1e-12)
    got = {r["id"]: r["absorption_prob"] for r in both.values.collect()}
    assert all(got[k] == pytest.approx(1.0, abs=1e-9) for k in "0123")
    one = absorption_probabilities(g, ["0"], max_iter=500, tol=1e-12)
    got1 = {r["id"]: r["absorption_prob"] for r in one.values.collect()}
    assert got1["2"] == pytest.approx(1.0, abs=1e-6)


def test_weighted_transition_respected(spark):
    # a -> t (weight 3), a -> b (weight 1): h(a) = 1 + 0.25*h(b);
    # b -> t deterministic: h(b) = 1  ->  h(a) = 1.25
    g = _g(spark, [("a", "t"), ("a", "b"), ("b", "t")], weights=[3.0, 1.0, 1.0])
    res = hitting_times(g, ["t"], max_iter=50, tol=1e-12)
    got = {r["id"]: r["hitting_time"] for r in res.values.collect()}
    assert got["a"] == pytest.approx(1.25)
    assert got["b"] == pytest.approx(1.0)


def test_fixed_iteration_python_replay(spark):
    # tol=0.0 runs exactly k supersteps; replay the truncated recursion in
    # plain python over the same normalized chain
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")]
    g = _g(spark, pairs)
    res = hitting_times(g, ["c"], max_iter=4, tol=0.0)
    assert res.iterations == 4 and not res.converged

    P = {"a": [("b", 0.5), ("c", 0.5)], "b": [("c", 1.0)],
         "c": [("a", 1.0)], "d": [("a", 1.0)]}
    h = {n: 0.0 for n in "abcd"}
    for _ in range(4):
        h = {
            n: 0.0 if n == "c" else 1.0 + sum(p * h[u] for u, p in P[n])
            for n in "abcd"
        }
    got = {r["id"]: r["hitting_time"] for r in res.values.collect()}
    assert got == pytest.approx(h)


def test_empty_targets_raise(spark):
    g = _g(spark, [("a", "b")])
    with pytest.raises(ValueError):
        hitting_times(g, [])
