"""4-clique counting (oriented-DAG kClist listing) and SCC condensation."""

import itertools
import random

from linkgraph import LinkGraph, clique4_count, condensation


def _k(n, prefix):
    return [
        (f"{prefix}{i}", f"{prefix}{j}")
        for i, j in itertools.combinations(range(n), 2)
    ]


def test_clique4_k5_plus_k4_plus_path(spark):
    # K5 -> C(5,4)=5, disjoint K4 -> 1, path adds none
    edges = _k(5, "a") + _k(4, "b") + [("p0", "p1"), ("p1", "p2")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert clique4_count(g) == 6


def test_clique4_k3_is_zero(spark):
    g = LinkGraph(spark.createDataFrame(_k(3, "t"), ["src", "dst"]))
    assert clique4_count(g) == 0


def test_clique4_direction_and_duplicates_ignored(spark):
    # K4 given with reversed duplicates and a self-loop: still exactly 1
    edges = _k(4, "c")
    edges += [(b, a) for a, b in edges] + [("c0", "c0")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert clique4_count(g) == 1


def test_clique4_random_vs_bruteforce(spark):
    random.seed(11)
    nodes = [f"v{i}" for i in range(24)]
    edges = sorted(
        {(a, b) for a in nodes for b in nodes if a < b and random.random() < 0.3}
    )
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    nbr = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    expected = sum(
        1
        for q in itertools.combinations(sorted(nbr), 4)
        if all(y in nbr[x] for x, y in itertools.combinations(q, 2))
    )
    assert clique4_count(g) == expected


def _pairs(df):
    return {(r["src_scc"], r["dst_scc"]) for r in df.collect()}


def test_condensation_two_cycles_bridge_sink(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "z"), ("z", "x"),
        ("a", "x"), ("z", "s"),
    ]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert _pairs(condensation(g)) == {("a", "x"), ("x", "s")}


def test_condensation_dag_identity(spark):
    # a DAG condenses to itself (distinct edges)
    edges = [("1", "2"), ("1", "3"), ("2", "4"), ("1", "2")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert _pairs(condensation(g)) == {("1", "2"), ("1", "3"), ("2", "4")}


def test_condensation_single_scc_empty(spark):
    edges = [("a", "b"), ("b", "a")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert condensation(g).count() == 0


def test_condensation_accepts_precomputed_labels(spark):
    edges = [("a", "b"), ("b", "a"), ("b", "c")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    labels = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c")], ["id", "scc"]
    )
    assert _pairs(condensation(g, labels=labels)) == {("a", "c")}
