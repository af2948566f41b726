"""Graph snapshot diff: edge adds/removes, degree deltas."""

from linkgraph import LinkGraph
from linkgraph.diff import degree_delta, edge_diff


def _g(spark, edges):
    return LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))


def test_edge_diff(spark):
    old = _g(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    new = _g(spark, [("a", "b"), ("c", "d"), ("d", "e"), ("e", "a")])
    got = {(r.src, r.dst): r.change for r in edge_diff(old, new).collect()}
    assert got == {
        ("b", "c"): "removed",
        ("d", "e"): "added",
        ("e", "a"): "added",
    }
    # identical snapshots diff to nothing
    assert edge_diff(old, old).count() == 0


def test_degree_delta_zero_fill_and_full_coverage(spark):
    old = _g(spark, [("a", "b"), ("b", "c")])
    new = _g(spark, [("a", "b"), ("a", "c"), ("a", "d")])
    got = {
        r["id"]: (r.old_degree, r.new_degree, r.delta)
        for r in degree_delta(old, new).collect()
    }
    assert got == {
        "a": (1, 3, 2),
        "b": (2, 1, -1),
        "c": (1, 1, 0),   # unchanged degree still present
        "d": (0, 1, 1),   # new node zero-filled on the old side
    }
