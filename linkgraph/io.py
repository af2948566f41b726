"""Bucketed edge-table storage — the co-located-join layout for 100 TB.

The reference reads edges from whatever DataFrame the caller hands it
(``mercury/graph/core/graph.py`` constructor paths); it has no managed
storage layout, so every self-join / degree aggregation over a persisted
edge table starts with a full shuffle. At 100 TB that shuffle IS the cost
of triangles, co-occurrence joins, and every join keyed on ``src``.

Spark's answer is bucketing: write the edge table ``bucketBy(n, src)``
sorted within buckets, and Catalyst plans joins and aggregations keyed on
``src`` WITHOUT an exchange — the bucket layout is the shuffle, paid once
at write time and amortized over every subsequent query. This module wraps
that layout behind two calls:

    write_edges_bucketed(edges, "edges_b", buckets=256, path=...)
    g = read_edges_bucketed(spark, "edges_b")   # LinkGraph over the table

Layout rules of thumb at scale: buckets ≈ cluster cores × small multiple
(so one bucket ≈ one task), bucket count FIXED for the table's lifetime
(both sides of a co-located join must agree), sort by the bucket key so
merge-style access patterns stay sequential. The bucket metadata lives in
the session catalog (Hive metastore on a real cluster; the in-memory
catalog locally) — a plain ``spark.read.parquet`` of the same files would
NOT see it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from linkgraph.graph import SRC, LinkGraph


def write_edges_bucketed(
    edges: DataFrame,
    table: str,
    buckets: int = 64,
    path: str | None = None,
    bucket_col: str = SRC,
    sort_col: str | None = None,
) -> None:
    """Write ``edges`` as a bucketed parquet table registered in the session
    catalog. ``path`` makes it an external table (data survives catalog
    loss; re-register by calling this again or via ``CREATE TABLE ...
    USING parquet``)."""
    w = (
        edges.write.format("parquet")
        .bucketBy(buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
        .mode("overwrite")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_edges_bucketed(
    spark: SparkSession, table: str, keys: dict | None = None
) -> LinkGraph:
    """LinkGraph over a bucketed edge table. Joins/aggregations keyed on the
    bucket column plan exchange-free (asserted by tests/test_plans.py)."""
    return LinkGraph(spark.table(table), keys=keys)
