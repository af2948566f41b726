"""Skew handling: hub-vertex splitting + two-phase (salted) aggregation.

The reference's only skew mitigation is a lossy out-degree cap
(``spark_randomwalker.py:168-186``). At 10^12-file scale hub repos/files
produce aggregation keys with millions of rows; the north rule
(BASELINE.json:6,14) requires high-degree vertex splitting and two-phase
aggregation instead.

Notes on when this matters: Spark's hash aggregate already does map-side
partial aggregation for algebraic aggregates (sum/count/min/max), so a plain
``groupBy(dst).sum()`` is NOT skewed at the reduce side (each map task emits
one partial row per key). Salting is needed for:

- non-algebraic aggregates (``collect_list`` — the CSR adjacency build),
- hot-key *joins* beyond what AQE skew-join splits,
- extreme hubs where even the per-map partial rows concentrate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def with_salt(df: DataFrame, key: str, buckets: int, seed: int = 17) -> DataFrame:
    """Deterministic per-row salt in [0, buckets): pmod(xxhash64(key, other
    cols, seed)). Uses all columns so rows of one hot key spread evenly."""
    return df.withColumn(
        SALT, F.pmod(F.xxhash64(*df.columns, F.lit(seed)), F.lit(buckets))
    )


def two_phase_sum(
    df: DataFrame, key: str, value: str, out: str, buckets: int = 16
) -> DataFrame:
    """groupBy(key, salt).sum → groupBy(key).sum — the salted partial/final
    aggregation demanded by BASELINE.json:6 for hub keys.

    Measured boundary (scripts/bench_skew.py, 8M-degree hub, local[8]): for
    ALGEBRAIC sums this is 0.56x of the plain groupBy — Spark's map-side
    partial aggregation already collapses hub fan-in to one row per map
    task, so the second shuffle is pure cost. Use it for aggregates whose
    partials still concentrate (collect_list/collect_set — see
    LinkGraph.grouped_adjacency's hub_threshold, measured 1.56-2.42x
    faster there) or when map-side combine is disabled; do NOT wrap plain
    sums in it by default."""
    salted = with_salt(df, key, buckets)
    partial = salted.groupBy(key, SALT).agg(F.sum(value).alias(out))
    return partial.groupBy(key).agg(F.sum(out).alias(out))


def split_hubs(
    edges: DataFrame,
    key: str = "src",
    degree_threshold: int = 100_000,
    buckets: int = 32,
) -> DataFrame:
    """High-degree vertex splitting: rows whose ``key`` has degree above the
    threshold get a salt bucket column ``_salt`` (0 for non-hubs). Downstream
    grouped builds (CSR adjacency) group by (key, _salt) so a 10M-edge hub
    becomes ``buckets`` tractable groups; consumers merge per-key afterwards.
    """
    deg = edges.groupBy(key).agg(F.count(F.lit(1)).alias("_deg"))
    hubs = deg.filter(F.col("_deg") > degree_threshold).select(key)
    flagged = edges.join(
        F.broadcast(hubs.withColumn("_is_hub", F.lit(True))), key, "left"
    )
    return flagged.withColumn(
        SALT,
        F.when(
            F.col("_is_hub").isNotNull(),
            F.pmod(F.xxhash64(*edges.columns, F.lit(17)), F.lit(buckets)),
        ).otherwise(F.lit(0)),
    ).drop("_is_hub")
