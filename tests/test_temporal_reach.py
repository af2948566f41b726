"""Temporal reachability: python label-correcting reference + closed forms."""

import random

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph, temporal_reachability


def _g(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string, ts double")


def _py_reach(edges, sources, start=float("-inf"), delay=0.0, strict=False):
    """Reference: relax until fixpoint over (node -> earliest arrival)."""
    arr = {s: start for s in sources}
    changed = True
    while changed:
        changed = False
        for u, v, ts in edges:
            if u in arr:
                ok = ts > arr[u] + delay if strict else ts >= arr[u] + delay
                if ok and ts < arr.get(v, float("inf")):
                    arr[v] = ts
                    changed = True
    return arr


def test_chain_with_time_violation(spark):
    # a->b at t5, b->c at t3: c is NOT reachable time-respectingly,
    # even though the static path exists
    g = LinkGraph(_g(spark, [("a", "b", 5.0), ("b", "c", 3.0)]))
    got = {r["id"]: r["arrival"] for r in temporal_reachability(g, ["a"]).collect()}
    assert got["a"] == float("-inf")
    assert got["b"] == 5.0
    assert "c" not in got


def test_equal_time_and_strict(spark):
    edges = [("a", "b", 2.0), ("b", "c", 2.0)]
    g = LinkGraph(_g(spark, edges))
    lax = {r["id"]: r["arrival"] for r in temporal_reachability(g, ["a"]).collect()}
    assert lax["c"] == 2.0  # >= lets the equal-time hop through
    hard = {
        r["id"]: r["arrival"]
        for r in temporal_reachability(g, ["a"], strict=True).collect()
    }
    assert "c" not in hard  # > forbids it


def test_delay_blocks_tight_connections(spark):
    edges = [("a", "b", 1.0), ("b", "c", 2.0), ("b", "d", 5.0)]
    g = LinkGraph(_g(spark, edges))
    got = {
        r["id"]: r["arrival"]
        for r in temporal_reachability(g, ["a"], start=-1.0, delay=2.0).collect()
    }
    # first hop needs ts >= start+delay = 1 -> b arrives at 1; c needs
    # ts >= 3 (has 2) -> blocked; d at 5 ok (delay applies uniformly,
    # including departure from the source)
    assert "c" not in got and got["d"] == 5.0 and got["b"] == 1.0


def test_start_time_prunes_old_edges(spark):
    edges = [("a", "b", 1.0), ("a", "c", 9.0)]
    g = LinkGraph(_g(spark, edges))
    got = {
        r["id"]: r["arrival"]
        for r in temporal_reachability(g, ["a"], start=5.0).collect()
    }
    assert "b" not in got and got["c"] == 9.0 and got["a"] == 5.0


def test_random_vs_python_reference(spark):
    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(30)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes), float(rng.randint(0, 20)))
        for _ in range(150)
    ]
    edges = [(u, v, t) for u, v, t in edges if u != v]
    g = LinkGraph(_g(spark, edges))
    for strict in (False, True):
        want = _py_reach(edges, {"n0", "n1"}, start=0.0, strict=strict)
        got = {
            r["id"]: r["arrival"]
            for r in temporal_reachability(
                g, ["n0", "n1"], start=0.0, strict=strict
            ).collect()
        }
        assert got == pytest.approx(want)


def test_earliest_arrival_takes_later_departure(spark):
    # two routes a->c: direct at t10, or a->b t1 then b->c t4 — the relay
    # arrives at 4 < 10, and a later better relay (a->b t2, b->c t3) must
    # still be found by min-merge, not first-found
    edges = [
        ("a", "c", 10.0),
        ("a", "b", 1.0),
        ("b", "c", 4.0),
        ("a", "b", 2.0),
        ("b", "c", 3.0),
    ]
    g = LinkGraph(_g(spark, edges))
    got = {
        r["id"]: r["arrival"]
        for r in temporal_reachability(g, ["a"], start=0.0).collect()
    }
    # b at 1; from arrival 1 both b->c edges (3, 4) are usable -> c at 3
    assert got["b"] == 1.0 and got["c"] == 3.0


def test_reach_plan_is_window_free(spark):
    from linkgraph.algorithms.temporal_reach import _reach_round

    g = LinkGraph(_g(spark, [("a", "b", 1.0)]))
    edges = g.edges.selectExpr("src as u", "dst as v", "ts as _ts")
    state = spark.createDataFrame([("a", 0.0)], ["id", "arrival"]).withColumnRenamed(
        "id", "id"
    )
    plan = (
        _reach_round(state, state, edges, 0.0, False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "EvalPython" not in plan
