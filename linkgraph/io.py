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


def write_transition_pruned(
    graph: LinkGraph, path: str, buckets: int = 256
) -> None:
    """Write a graph's NORMALIZED transition edges (u, v, frac = w/W(u))
    partitioned by ``_b = pmod(xxhash64(u), buckets)`` — the layout that
    makes frontier-sparse superstep algorithms (batched PPR, BFS from few
    seeds) scan only the buckets their frontier touches instead of the
    whole edge table. The dangling-node set (no out-edges) is co-written;
    both are plain parquet directories, filesystem-agnostic:

        path/edges/_b=<k>/...   path/dangling/...   path/meta/...

    Normalization happens HERE, once at write time, because w/W needs a
    global per-source aggregate a pruned scan could never see."""
    from pyspark.sql import functions as F

    from linkgraph.graph import DST, ID

    if buckets <= 0:
        raise ValueError(f"buckets must be > 0, got {buckets}")
    w = graph.weight_col()
    raw = graph.edges.select(
        F.col(SRC).alias("u"), F.col(DST).alias("v"), w.alias("w")
    )
    outw = raw.groupBy("u").agg(F.sum("w").alias("wsum"))
    # Layout: ONE flat parquet directory, range-partitioned + sorted by the
    # bucket id ``_b`` kept as a DATA column. Each file then covers a
    # contiguous bucket range, so a frontier's ``_b`` predicate prunes
    # whole files/row groups from the footer min/max stats — while a DENSE
    # frontier (the common late-superstep case) scans a handful of large
    # files instead of `buckets` hive directories. The former
    # partitionBy("_b") layout paid `buckets` tiny files + directory
    # listings on every cold read: the r5 bench measured the pruned COLD
    # path slower than the unpruned scan from exactly that overhead
    # (guide §6 — small files hurt twice).
    n_files = max(1, buckets // 32)
    (
        raw.join(outw.hint("shuffle_hash"), "u")
        .select(
            "u", "v", (F.col("w") / F.col("wsum")).alias("frac"),
            F.pmod(F.xxhash64("u"), F.lit(buckets)).cast("int").alias("_b"),
        )
        .repartitionByRange(n_files, "_b")
        .sortWithinPartitions("_b")
        .write.mode("overwrite")
        .parquet(f"{path}/edges")
    )
    (
        graph.nodes.select(ID)
        .join(raw.select(F.col("u").alias(ID)).distinct(), ID, "left_anti")
        .write.mode("overwrite")
        .parquet(f"{path}/dangling")
    )
    spark = graph.edges.sparkSession
    spark.createDataFrame([(buckets,)], "buckets int").write.mode(
        "overwrite"
    ).json(f"{path}/meta")


def transition_meta(spark: SparkSession, path: str) -> int:
    """Bucket count a pruned transition table was written with."""
    return int(spark.read.json(f"{path}/meta").collect()[0]["buckets"])


def scan_transition_for_frontier(
    spark: SparkSession, path: str, frontier: DataFrame, buckets: int | None = None
) -> DataFrame:
    """DataFrame[u, v, frac] — ONLY the transition-edge buckets the
    frontier's source nodes can live in: the frontier's distinct bucket
    ids (≤ ``buckets`` ints, driver-tiny by construction) become a literal
    ``_b`` predicate that pushes down to the bucket-range-sorted parquet
    layout (file/row-group pruning from footer stats). Per-round work then
    tracks the frontier, not the graph — the upgrade path named in
    ``ppr_batch``'s docstring. A frontier covering EVERY bucket skips the
    predicate outright (nothing to prune, and the filter would only cost
    scan time)."""
    from pyspark.sql import functions as F

    if buckets is None:
        buckets = transition_meta(spark, path)
    fcol = frontier.columns[0]
    bids = [
        r["_b"]
        for r in frontier.select(
            F.pmod(F.xxhash64(fcol), F.lit(buckets)).cast("int").alias("_b")
        )
        .distinct()
        .collect()
    ]
    scan = spark.read.parquet(f"{path}/edges")
    if len(bids) < buckets:
        scan = scan.filter(F.col("_b").isin(bids))
    return scan.select("u", "v", "frac")
