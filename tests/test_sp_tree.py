"""shortest_path_tree + reconstruct_path."""

import pytest
from pyspark.sql import functions as F

from linkgraph import reconstruct_path, shortest_path_tree, shortest_paths_weighted
from linkgraph.graph import LinkGraph


def _g(spark, rows, directed=True):
    return LinkGraph(
        spark.createDataFrame(rows, "src string, dst string, weight double"),
        keys={"directed": directed},
    )


def _tree(df):
    return {r["id"]: (r["dist"], r["parent"]) for r in df.collect()}


def test_tree_dists_match_sssp_and_parents_are_consistent(spark):
    rows = [
        ("a", "b", 2.0), ("b", "c", 7.0), ("a", "c", 10.0),
        ("c", "d", 1.0), ("b", "d", 9.0), ("d", "e", 4.0),
    ]
    g = _g(spark, rows, directed=False)
    t = _tree(shortest_path_tree(g, "a"))
    d = {r["id"]: r["dist"] for r in shortest_paths_weighted(g, ["a"]).collect()}
    assert {k: v[0] for k, v in t.items()} == d
    # parent invariant: dist(v) == dist(parent) + w(parent, v)
    w = {}
    for s, x, wt in rows:
        w[(s, x)] = w[(x, s)] = wt
    for v, (dv, p) in t.items():
        if p is None:
            assert v == "a" and dv == 0.0
        else:
            assert dv == pytest.approx(t[p][0] + w[(p, v)], abs=1e-12)


def test_deterministic_tie_break_min_parent(spark):
    # two equal-cost routes to d: a-b-d and a-c-d (cost 2) -> parent 'b'
    g = _g(spark, [("a", "b", 1.0), ("a", "c", 1.0), ("b", "d", 1.0), ("c", "d", 1.0)])
    t = _tree(shortest_path_tree(g, "a"))
    assert t["d"] == (2.0, "b")


def test_reconstruct_path(spark):
    g = _g(spark, [("a", "b", 2.0), ("b", "c", 7.0), ("a", "c", 10.0), ("c", "d", 1.0)], directed=False)
    tree = shortest_path_tree(g, "a").persist()
    try:
        assert reconstruct_path(tree, "d") == ["a", "b", "c", "d"]
        assert reconstruct_path(tree, "a") == ["a"]
        assert reconstruct_path(tree, "ghost") == []
    finally:
        tree.unpersist()


def test_unreachable_nodes_absent(spark):
    g = _g(spark, [("a", "b", 1.0), ("x", "y", 1.0)])
    t = _tree(shortest_path_tree(g, "a"))
    assert set(t) == {"a", "b"}


def test_phantom_source_empty(spark):
    g = _g(spark, [("a", "b", 1.0)])
    assert shortest_path_tree(g, "ghost").count() == 0
