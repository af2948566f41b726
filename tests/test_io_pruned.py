"""Frontier-pruned transition layout (io.py) + ppr_batch integration."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.ppr_batch import personalized_pagerank_batch
from linkgraph.graph import LinkGraph
from linkgraph.io import (
    scan_transition_for_frontier,
    transition_meta,
    write_transition_pruned,
)


@pytest.fixture()
def tpath():
    d = tempfile.mkdtemp(prefix="lg_trans_")
    yield d + "/t"
    shutil.rmtree(d, ignore_errors=True)


def _g(spark):
    rows = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
        ("c", "a", 1.0), ("b", "d", 1.0),  # d dangling
    ]
    return LinkGraph(
        spark.createDataFrame(rows, "src string, dst string, weight double"),
        keys={"directed": True},
    )


def test_write_read_meta_and_fracs(spark, tpath):
    g = _g(spark)
    write_transition_pruned(g, tpath, buckets=8)
    assert transition_meta(spark, tpath) == 8
    full = spark.read.parquet(f"{tpath}/edges")
    fr = {(r["u"], r["v"]): r["frac"] for r in full.collect()}
    assert fr[("a", "b")] == pytest.approx(0.75)
    assert fr[("a", "c")] == pytest.approx(0.25)
    dang = {r["id"] for r in spark.read.parquet(f"{tpath}/dangling").collect()}
    assert dang == {"d"}
    with pytest.raises(ValueError, match="buckets"):
        write_transition_pruned(g, tpath, buckets=0)


def test_frontier_scan_prunes_partitions(spark, tpath):
    g = _g(spark)
    write_transition_pruned(g, tpath, buckets=16)
    frontier = spark.createDataFrame([("a",)], "id string")
    scan = scan_transition_for_frontier(spark, tpath, frontier)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must reach the parquet scan as a pushed data
    # filter (the flat bucket-range-sorted layout prunes via footer stats)
    assert "PushedFilters" in plan and "_b" in plan
    rows = {(r["u"], r["v"]) for r in scan.collect()}
    # a's edges MUST be present; anything extra must share a's bucket
    assert {("a", "b"), ("a", "c")} <= rows
    abucket = spark.createDataFrame([("a",)], "id string").select(
        F.pmod(F.xxhash64("id"), F.lit(16)).cast("int").alias("b")
    ).collect()[0]["b"]
    for u, _ in rows:
        bu = spark.createDataFrame([(u,)], "id string").select(
            F.pmod(F.xxhash64("id"), F.lit(16)).cast("int").alias("b")
        ).collect()[0]["b"]
        assert bu == abucket


def test_ppr_batch_pruned_equals_pinned(spark, tpath):
    g = _g(spark)
    write_transition_pruned(g, tpath, buckets=8)
    base = {
        (r["seed"], r["id"]): r["pagerank"]
        for r in personalized_pagerank_batch(
            g, ["a", "d"], tol=0.0, max_iter=6
        ).collect()
    }
    pruned = {
        (r["seed"], r["id"]): r["pagerank"]
        for r in personalized_pagerank_batch(
            g, ["a", "d"], tol=0.0, max_iter=6, transition_path=tpath
        ).collect()
    }
    assert set(base) == set(pruned)
    for k, v in base.items():
        assert pruned[k] == pytest.approx(v, abs=1e-15), k
