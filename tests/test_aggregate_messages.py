"""aggregate_messages primitive: closed forms + equivalence with the
engine's own degree operator."""

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph, aggregate_messages


@pytest.fixture(scope="module")
def g(spark):
    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 4.0)],
        ["src", "dst", "weight"],
    )
    return LinkGraph(edges)


def test_weighted_in_degree(spark, g):
    out = aggregate_messages(
        g, agg=F.sum("msg").alias("win"), to_dst=F.col("weight")
    )
    rows = {r["id"]: r["win"] for r in out.collect()}
    assert rows == {"b": 2.0, "c": 5.0}


def test_both_directions_single_shuffle(spark, g):
    # total degree = messages both ways, aggregated once
    out = aggregate_messages(
        g,
        agg=F.count(F.lit(1)).alias("deg"),
        to_dst=F.lit(1),
        to_src=F.lit(1),
    )
    rows = {r["id"]: r["deg"] for r in out.collect()}
    assert rows == {"a": 2, "b": 2, "c": 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "EvalPython" not in plan


def test_node_attrs_in_messages(spark, g):
    attrs = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 30.0)], ["id", "rank"]
    )
    # each node receives its in-neighbors' rank * edge weight (the pagerank
    # contribution shape)
    out = aggregate_messages(
        g,
        agg=F.sum("msg").alias("contrib"),
        to_dst=F.col("src_rank") * F.col("weight"),
        node_attrs=attrs,
    )
    rows = {r["id"]: r["contrib"] for r in out.collect()}
    assert rows == {"b": 20.0, "c": 10.0 + 80.0}


def test_missing_attrs_are_null_and_requires_direction(spark, g):
    attrs = spark.createDataFrame([("a", 1.0)], ["id", "rank"])
    out = aggregate_messages(
        g,
        agg=F.max("msg").alias("m"),
        to_src=F.col("dst_rank"),
        node_attrs=attrs,
    )
    rows = {r["id"]: r["m"] for r in out.collect()}
    # a's out-neighbors b, c have no attrs -> null messages -> max null
    assert rows["a"] is None
    with pytest.raises(ValueError):
        aggregate_messages(g, agg=F.sum("msg").alias("s"))
