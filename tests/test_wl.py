"""Weisfeiler–Lehman refinement: structural-role and isomorphism laws."""

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph
from linkgraph.algorithms.wl import wl_colors, wl_fingerprint


def _g(spark, edges, directed=False):
    return LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]),
        keys={"directed": directed},
    )


def test_star_roles(spark):
    g = _g(spark, [("h", f"l{i}") for i in range(5)])
    cols = {r["id"]: r["wl_color"] for r in wl_colors(g, rounds=2).collect()}
    leaves = {cols[f"l{i}"] for i in range(5)}
    assert len(leaves) == 1            # all leaves share a role
    assert cols["h"] not in leaves     # the hub is a different role


def test_path_refinement_splits_equal_degrees(spark):
    # P5: n1 and n2 both have degree 2, but n1 touches an endpoint —
    # round 2 must split them (round 1 alone sees only degree multisets)
    edges = [(f"n{i}", f"n{i+1}") for i in range(4)]
    g = _g(spark, edges)
    c1 = {r["id"]: r["wl_color"] for r in wl_colors(g, rounds=1).collect()}
    assert c1["n1"] != c1["n2"]  # {1,2} vs {2,2} neighbor degrees
    c2 = {r["id"]: r["wl_color"] for r in wl_colors(g, rounds=2).collect()}
    assert c2["n1"] == c2["n3"] and c2["n0"] == c2["n4"]  # mirror symmetry


def test_cycle_vs_path_fingerprint(spark):
    cycle = [(f"c{i}", f"c{(i+1) % 6}") for i in range(6)]
    path = [(f"p{i}", f"p{i+1}") for i in range(5)]
    assert wl_fingerprint(_g(spark, cycle), 2) != wl_fingerprint(
        _g(spark, path), 2
    )


def test_isomorphic_graphs_same_fingerprint(spark):
    a = [("x", "y"), ("y", "z"), ("z", "x"), ("z", "t")]
    b = [("1", "2"), ("2", "3"), ("3", "1"), ("3", "4")]  # same shape, new names
    assert wl_fingerprint(_g(spark, a), 3) == wl_fingerprint(_g(spark, b), 3)


def test_directed_in_neighbor_refinement(spark):
    # a->b, c->b: a and c are sources (in-degree 0 after doubling OFF)
    g = _g(spark, [("a", "b"), ("c", "b")], directed=True)
    cols = {r["id"]: r["wl_color"] for r in wl_colors(g, rounds=1).collect()}
    assert cols["a"] == cols["c"] != cols["b"]


def test_rounds_guard_and_plan(spark):
    g = _g(spark, [("a", "b")])
    with pytest.raises(ValueError):
        wl_colors(g, rounds=-1)
    plan = wl_colors(g, rounds=1)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "EvalPython" not in plan
