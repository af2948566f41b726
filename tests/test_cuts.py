"""Bridges + articulation points — networkx parity, guard, edge cases."""

import random

import pytest

from linkgraph import LinkGraph, articulation_points, bridges

nx = pytest.importorskip("networkx")


def _check(spark, edges, extra_nodes=()):
    nodes = sorted({x for e in edges for x in e} | set(extra_nodes))
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]),
        nodes=spark.createDataFrame([(x,) for x in nodes], ["id"]),
    )
    G = nx.Graph(edges)
    G.add_nodes_from(extra_nodes)
    got_b = sorted(tuple(r) for r in bridges(g).collect())
    exp_b = sorted((min(a, b), max(a, b)) for a, b in nx.bridges(G))
    got_a = sorted(r["id"] for r in articulation_points(g).collect())
    exp_a = sorted(nx.articulation_points(G))
    assert got_b == exp_b
    assert got_a == exp_a


def test_barbell(spark):
    _check(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("c", "d"),
         ("d", "e"), ("e", "f"), ("f", "d")],
    )


def test_tree_every_edge_bridges(spark):
    _check(spark, [("1", "2"), ("2", "3"), ("2", "4"), ("4", "5")])


def test_cycle_has_no_cuts(spark):
    _check(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])


def test_isolated_and_duplicates(spark):
    _check(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "c")],
        extra_nodes=["z"],
    )


def test_random_graphs(spark):
    random.seed(13)
    for trial in range(4):
        nodes = [f"v{i}" for i in range(30)]
        edges = sorted(
            {
                (a, b)
                for a in nodes
                for b in nodes
                if a < b and random.random() < 0.05 + 0.04 * trial
            }
        )
        if edges:
            _check(spark, edges)


def test_size_guard(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError):
        bridges(g, max_nodes=1)
    with pytest.raises(ValueError):
        articulation_points(g, max_nodes=1)
