"""SparkSession factory with engine defaults.

Replaces the reference's ``SparkInterface`` singleton
(``mercury/graph/core/spark_interface.py:33-134``) with a plain factory:
Arrow on (all per-vertex kernels are pandas/Arrow UDFs), AQE on (runtime
skew-join splitting + partition coalescing), shuffle partitions scaled to
cores. On a real cluster these are passed via ``spark-submit --conf``; the
factory only fills in what is unset so cluster configs win.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

ENGINE_CONF = {
    # Arrow batches for every pandas_udf / applyInPandas kernel.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime partition coalescing + skew-join splitting for hub joins.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Iterative supersteps re-plan constantly; keep planner output quiet.
    "spark.ui.showConsoleProgress": "false",
    # Local mode: skip reverse-DNS + UI server (multi-second scheduler stalls
    # in sandboxes otherwise). Harmless/overridden under a real cluster
    # manager, where spark-submit conf wins.
    "spark.driver.host": "127.0.0.1",
    "spark.driver.bindAddress": "127.0.0.1",
    "spark.ui.enabled": "false",
    # Iterative supersteps re-submit many small stages; never stall on locality.
    "spark.locality.wait": "0",
    # Superstep joins are equi-joins of a large cached edge table against a
    # small rank table: shuffled-hash (build small side, stream edges) beats
    # sort-merge, which would re-sort the edge side every superstep.
    "spark.sql.join.preferSortMergeJoin": "false",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_session(
    app_name: str = "linkgraph",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Get or create a SparkSession with engine defaults.

    ``cores`` only applies when creating a fresh local session; an already
    running session (e.g. provided by spark-submit on a cluster) is reused
    untouched except for the checkpoint dir.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        if checkpoint_dir:
            active.sparkContext.setCheckpointDir(checkpoint_dir)
        return active

    from pyspark import SparkConf

    submitted = SparkConf()  # carries spark-submit --master/--conf properties
    cores = cores or default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if not submitted.contains("spark.master"):
        builder = builder.master(f"local[{cores}]")
    conf = dict(ENGINE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cores)
    conf["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        # spark-submit / cluster-manager conf always wins over engine defaults
        if not submitted.contains(k):
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    return spark


def shuffle_partitions(spark: SparkSession) -> int:
    """Numeric shuffle-partition count, falling back to the cluster's
    default parallelism on environments where the conf is non-numeric
    (e.g. Databricks sets ``spark.sql.shuffle.partitions=auto``)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


@contextmanager
def static_plans(spark: SparkSession):
    """Disable AQE for the duration of an iterative superstep loop.

    Superstep dataflows have a fixed, explicitly partitioned shape (edges
    pre-partitioned by src, ranks by id); AQE's per-stage re-optimization
    barriers only add scheduling latency there and can re-coalesce partitions
    under the co-partitioned joins. One-shot exploratory queries (triangle
    join, corpus derivation) keep AQE for skew-join splitting.
    """
    try:
        old = spark.conf.get("spark.sql.adaptive.enabled")
    except Exception:
        old = "true"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def pin_partitioned(df):
    """Materialize a STATIC table that a superstep loop will scan every
    round, keeping its partitioning visible to Catalyst.

    ``localCheckpoint`` severs the lineage to a ``Scan ExistingRDD`` whose
    output partitioning is UNKNOWN — EnsureRequirements then re-exchanges
    the table under every per-round join, even when it was explicitly
    ``repartition(k, key)``-ed. ``persist()`` keeps the logical plan (and
    its partitioning) while caching the blocks, so a pre-partitioned edge
    table is exchanged ONCE at build and only the node-sized side shuffles
    per round. Use for build-once scan-many tables only (iterative STATE
    must still localCheckpoint to truncate plan growth). Caller unpersists.
    """
    df = df.persist()
    df.count()
    return df


class PinnedGenerations:
    """Generation tracker for a mutating-but-scanned-per-round table
    (Luby/Borůvka-style peeling): ``pin`` persists + materializes the new
    generation — reading the previous one from cache — then releases every
    older generation. Same partitioning rationale as :func:`pin_partitioned`.
    Call :meth:`release` on every exit path."""

    def __init__(self):
        self._live = []

    def pin(self, df):
        df = df.persist()
        df.count()  # materialize BEFORE releasing what it was built from
        while self._live:
            self._live.pop().unpersist()
        self._live.append(df)
        return df

    def release(self):
        while self._live:
            self._live.pop().unpersist()
