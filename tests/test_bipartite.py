"""Bipartite detection + 2-coloring via double-cover CC — networkx parity."""

import random

import pytest

from linkgraph import LinkGraph, bipartite_coloring, is_bipartite

nx = pytest.importorskip("networkx")


def _g(spark, edges):
    return LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))


def test_even_cycle_true_odd_cycle_false(spark):
    c4 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    c5 = [("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"), ("5", "1")]
    assert is_bipartite(_g(spark, c4)) is True
    assert is_bipartite(_g(spark, c5)) is False


def test_self_loop_is_odd_cycle(spark):
    assert is_bipartite(_g(spark, [("x", "y"), ("y", "y")])) is False


def test_direction_ignored(spark):
    # anti-parallel pair = one undirected edge, still bipartite
    assert is_bipartite(_g(spark, [("a", "b"), ("b", "a")])) is True


def test_random_graphs_match_networkx(spark):
    random.seed(3)
    for trial in range(4):
        nodes = [f"v{i}" for i in range(14)]
        edges = sorted(
            {
                (a, b)
                for a in nodes
                for b in nodes
                if a < b and random.random() < (0.08 + 0.06 * trial)
            }
        )
        if not edges:
            continue
        G = nx.Graph(edges)
        assert is_bipartite(_g(spark, edges)) == nx.is_bipartite(G), edges


def test_coloring_valid_and_min_id_zero(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("p", "q")]
    col = {
        r["id"]: r["color"]
        for r in bipartite_coloring(_g(spark, edges)).collect()
    }
    for u, v in edges:
        assert col[u] != col[v]
    assert col["a"] == 0 and col["p"] == 0  # per-component min id colors 0


def test_coloring_covers_isolated_nodes(spark):
    nodes = spark.createDataFrame([("a",), ("b",), ("z",)], ["id"])
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    col = {
        r["id"]: r["color"]
        for r in bipartite_coloring(LinkGraph(edges, nodes=nodes)).collect()
    }
    assert set(col) == {"a", "b", "z"} and col["z"] == 0


def test_coloring_raises_on_odd_cycle(spark):
    with pytest.raises(ValueError):
        bipartite_coloring(_g(spark, [("1", "2"), ("2", "3"), ("3", "1")]))
    with pytest.raises(ValueError):
        bipartite_coloring(_g(spark, [("1", "1")]))
