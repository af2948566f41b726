"""Batched multi-seed PPR — per-seed parity with the single-seed engine.

All assertions run FIXED-STEP (tol=0): the batch loop's iterate equals the
single-seed loop's iterate superstep-for-superstep, and the conserved
properties (per-seed mass, weighted ratios) hold at EVERY iterate, so fixed
small step counts test exactly what convergence runs would — without paying
~140 scheduler-latency-bound supersteps per call in a local session.
"""

import pytest
from pyspark.sql import functions as F

from linkgraph import pagerank
from linkgraph.algorithms.ppr_batch import personalized_pagerank_batch, related_nodes
from linkgraph.graph import LinkGraph


def _g(spark, rows, directed=True):
    return LinkGraph(
        spark.createDataFrame(rows, "src string, dst string"),
        keys={"directed": directed},
    )


def _by_seed(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["seed"], {})[r["id"]] = r["pagerank"]
    return out


def test_matches_single_seed_ppr_with_dangling(spark):
    # directed graph with a dangling node and a cycle — exercises dangling
    # return-to-seed and multi-hop reach; 8 fixed supersteps, both loops
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d")]  # d dangling
    g = _g(spark, rows)
    seeds = ["a", "d"]
    batch = _by_seed(personalized_pagerank_batch(g, seeds, tol=0.0, max_iter=8))
    for s in seeds:
        single = {
            r["id"]: r["pagerank"]
            for r in pagerank(
                g, tol=0.0, max_iter=8, personalization={s: 1.0}
            ).ranks.collect()
            if r["pagerank"] != 0.0
        }
        assert set(batch[s]) == set(single)
        for v, val in single.items():
            assert batch[s][v] == pytest.approx(val, abs=1e-12), (s, v)


def test_per_seed_mass_conserved_every_iterate(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d")]
    g = _g(spark, rows)
    out = personalized_pagerank_batch(g, ["a", "b", "c"], tol=0.0, max_iter=5)
    sums = {
        r["seed"]: r["m"]
        for r in out.groupBy("seed").agg(F.sum("pagerank").alias("m")).collect()
    }
    assert set(sums) == {"a", "b", "c"}
    for s, m in sums.items():
        assert m == pytest.approx(1.0, abs=1e-12), s


def test_sparsity_unreachable_nodes_have_no_row(spark):
    # two components: seed in one must never emit rows in the other
    g = _g(spark, [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")])
    out = personalized_pagerank_batch(g, ["a"], tol=0.0, max_iter=5)
    ids = {r["id"] for r in out.collect()}
    assert ids == {"a", "b"}


def test_weighted_edges_respected(spark):
    # b and c receive only from a at frac 3/4 vs 1/4 -> exact 3x ratio at
    # every iterate
    g = LinkGraph(
        spark.createDataFrame(
            [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
            "src string, dst string, weight double",
        ),
        keys={"directed": True},
    )
    out = _by_seed(personalized_pagerank_batch(g, ["a"], tol=0.0, max_iter=6))
    assert out["a"]["b"] == pytest.approx(3 * out["a"]["c"], rel=1e-12)


def test_early_convergence_exit(spark):
    # an isolated self-loop node: fixpoint after one step (all mass stays);
    # a generous max_iter must exit early via the tol gate, not run 50 rounds
    g = _g(spark, [("a", "a"), ("b", "a")])
    out = personalized_pagerank_batch(g, ["a"], tol=1e-9, max_iter=50)
    rows = {r["id"]: r["pagerank"] for r in out.collect()}
    assert rows == {"a": pytest.approx(1.0, abs=1e-12)}


def test_related_nodes_topk_and_exclusion(spark):
    # star: hub h <-> s1..s4; related to h are the spokes (ties by id asc)
    rows = []
    for i in range(1, 5):
        rows += [("h", f"s{i}"), (f"s{i}", "h")]
    g = _g(spark, rows)
    out = related_nodes(g, ["h", "s1"], k=2, tol=0.0, max_iter=6).collect()
    per = {}
    for r in out:
        per.setdefault(r["seed"], []).append((r["rank"], r["id"]))
    assert sorted(per["h"]) == [(1, "s1"), (2, "s2")]
    assert per["s1"][0] == (1, "h")  # hub dominates s1's neighborhood
    assert all(r["id"] != r["seed"] for r in out)
    assert all(r["rank"] <= 2 for r in out)


def test_validation(spark):
    g = _g(spark, [("a", "b")])
    with pytest.raises(ValueError, match="non-empty"):
        personalized_pagerank_batch(g, [])
    with pytest.raises(ValueError, match="unique"):
        personalized_pagerank_batch(g, ["a", "a"])
    with pytest.raises(ValueError, match="not nodes"):
        personalized_pagerank_batch(g, ["a", "ghost"])
    with pytest.raises(ValueError, match="damping"):
        personalized_pagerank_batch(g, ["a"], damping=1.0)
    with pytest.raises(ValueError, match="k must"):
        related_nodes(g, ["a"], k=0)


def test_plan_no_python(spark):
    g = _g(spark, [("a", "b"), ("b", "a")])
    out = personalized_pagerank_batch(g, ["a"], tol=0.0, max_iter=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_related_topk_plans_as_window_group_limit(spark):
    g = _g(spark, [("a", "b"), ("b", "a")])
    out = related_nodes(g, ["a"], k=1, tol=0.0, max_iter=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and ", Partial" in plan
