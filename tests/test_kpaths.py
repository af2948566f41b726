"""k_lightest_walks — per-node top-k walk weights (beam-exact DP)."""

import pytest
from pyspark.sql import functions as F

from linkgraph import k_lightest_walks, shortest_paths_weighted
from linkgraph.graph import LinkGraph


def _g(spark, rows, directed):
    df = spark.createDataFrame(rows, "src string, dst string, weight double")
    return LinkGraph(df, keys={"directed": directed})


def _as_dict(df):
    return {r["id"]: list(r["walk_weights"]) for r in df.collect()}


def test_diamond_topk_exact(spark):
    # a->b(1), a->c(4), b->c(1), c->d(1), b->d(5): walks to d within 10 hops
    # are a-b-c-d=3, a-c-d=5, a-b-d=6 (DAG: no revisits possible).
    g = _g(
        spark,
        [("a", "b", 1.0), ("a", "c", 4.0), ("b", "c", 1.0),
         ("c", "d", 1.0), ("b", "d", 5.0)],
        directed=True,
    )
    out = _as_dict(k_lightest_walks(g, "a", k=3, max_hops=10))
    assert out["d"] == [3.0, 5.0, 6.0]
    assert out["a"] == [0.0]  # DAG source: only the empty walk
    assert out["c"] == [2.0, 4.0]  # fewer than k walks -> shorter array
    assert out["b"] == [1.0]


def test_undirected_revisits_and_duplicates(spark):
    # single undirected edge a-b (w=1): walks to b are 1, 3 (aba b), 5, ...
    # and back to a are 0, 2, 4, ... — revisit semantics, arithmetic ladder.
    g = _g(spark, [("a", "b", 1.0)], directed=False)
    out = _as_dict(k_lightest_walks(g, "a", k=3, max_hops=20))
    assert out["b"] == [1.0, 3.0, 5.0]
    assert out["a"] == [0.0, 2.0, 4.0]


def test_duplicate_weights_occupy_slots(spark):
    # triangle a-b-c all weight 1, undirected: walks to b of weight 2 are
    # a-c-b AND a-b-a-b... wait a-b-a-b is weight 3; weight-2 walks to b:
    # a-c-b only. To b: [1, 2, 3]; to a: [0, 2, 2] — two DISTINCT weight-2
    # closed walks (a-b-a and a-c-a) occupy two slots.
    g = _g(
        spark,
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0)],
        directed=False,
    )
    out = _as_dict(k_lightest_walks(g, "a", k=3, max_hops=15))
    assert out["a"] == [0.0, 2.0, 2.0]
    assert out["b"] == [1.0, 2.0, 3.0]


def test_k1_equals_weighted_sssp(spark):
    rows = [
        ("a", "b", 2.0), ("b", "c", 7.0), ("a", "c", 10.0),
        ("c", "d", 1.0), ("b", "d", 9.0),
    ]
    g = _g(spark, rows, directed=False)
    top1 = {
        r["id"]: r["walk_weights"][0]
        for r in k_lightest_walks(g, "a", k=1, max_hops=30).collect()
    }
    sssp = {
        r["id"]: r["dist"]
        for r in shortest_paths_weighted(g, sources=["a"]).collect()
    }
    assert top1 == sssp


def test_fixpoint_early_exit_is_unbounded_answer(spark):
    # path a-b-c with big weights: fixpoint within a huge hop budget means
    # the 3 lightest UNBOUNDED walks; detours add 2*w(edge).
    g = _g(spark, [("a", "b", 5.0), ("b", "c", 8.0)], directed=False)
    out = _as_dict(k_lightest_walks(g, "a", k=3, max_hops=50))
    # to c: 13, then +10 (bounce a-b) or +16 (bounce b-c) -> [13, 23, 29]
    assert out["c"] == [13.0, 23.0, 29.0]


def test_hop_budget_truncates(spark):
    # directed 3-chain, max_hops=1: only b reachable.
    g = _g(spark, [("a", "b", 1.0), ("b", "c", 1.0)], directed=True)
    out = _as_dict(k_lightest_walks(g, "a", k=2, max_hops=1))
    assert set(out) == {"a", "b"}
    assert out["b"] == [1.0]


def test_parallel_edges_collapse_to_lightest(spark):
    g = _g(spark, [("a", "b", 3.0), ("a", "b", 1.0)], directed=True)
    out = _as_dict(k_lightest_walks(g, "a", k=2, max_hops=5))
    assert out["b"] == [1.0]


def test_validation_errors(spark):
    g = _g(spark, [("a", "b", 1.0)], directed=True)
    with pytest.raises(ValueError, match="k must be"):
        k_lightest_walks(g, "a", k=0)
    with pytest.raises(ValueError, match="max_hops"):
        k_lightest_walks(g, "a", max_hops=0)
    bad = _g(spark, [("a", "b", 0.0)], directed=True)
    with pytest.raises(ValueError, match="strictly positive"):
        k_lightest_walks(bad, "a")


def test_plan_is_python_free(spark):
    g = _g(spark, [("a", "b", 1.0), ("b", "c", 2.0)], directed=False)
    out = k_lightest_walks(g, "a", k=2, max_hops=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_superstep_topk_plans_as_window_group_limit(spark):
    # the REAL per-round fold (not a lookalike): rank-limited window must
    # plan as Partial+Final WindowGroupLimit, never a full per-node sort
    from linkgraph.algorithms.kpaths import _topk_fold

    cand = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "id string, val double"
    )
    plan = _topk_fold(cand, 2)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and ", Partial" in plan
    assert "EvalPython" not in plan


def test_phantom_source_yields_no_rows(spark):
    # ADVICE r4: a source absent from the graph must return an empty
    # result (sssp.py's left_semi convention), not a fabricated
    # walk_weights=[0.0] row.
    g = _g(spark, [("a", "b", 1.0)], directed=True)
    assert k_lightest_walks(g, "ghost", k=2, max_hops=3).count() == 0
