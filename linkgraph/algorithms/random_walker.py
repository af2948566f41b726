"""Weighted random-walk path expansion from seed nodes.

Same dataflow as the reference's ``SparkRandomWalker``
(``mercury/graph/ml/spark_randomwalker.py:16-186``): starting from
``source_id`` node(s), every epoch extends each active path along ALL
out-edges of its current node (an expansion, not a sample), tracking the
path probability as a running product of ``weight / Σ weight over src``
(:111-127). Optional ``n_sampling_edges`` caps per-node fan-out by weighted
random top-k (``rand()·norm_weight`` + row_number window, :168-186).

The per-row Python UDF append (``udf_select_element_2``,
spark_node2vec.py:22-29) is replaced by native ``concat(path, array(dst))``
Column expressions; frontier is localCheckpointed per epoch (the reference's
checkpoint pattern). ``rand`` is seeded per epoch for reproducibility (the
reference leaves it unseeded, spark_randomwalker.py:173).

Returns DataFrame[random_walks: array<string>, weights: array<double>] —
one row per expanded path; weights[k] is the probability of the length-k
prefix (spark_randomwalker.py:60-62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def random_walks(
    graph: LinkGraph,
    source_id,
    num_epochs: int = 10,
    n_sampling_edges: int | None = None,
    seed: int = 42,
) -> DataFrame:
    sources = source_id if isinstance(source_id, list) else [source_id]
    with static_plans(graph.edges.sparkSession):
        return _walk_loop(graph, sources, num_epochs, n_sampling_edges, seed)


TOPK_BUCKETS = 32


def _weighted_topk_edges(edges, k: int, epoch_seed: int):
    """Per-source weighted random top-k fan-out cap
    (spark_randomwalker.py:168-186 semantics), hub-safe: the reference's
    single ``partitionBy(src)`` window sorts a hub's whole edge list in one
    task. Here the rank runs two-phase — top-k within ``TOPK_BUCKETS`` hash
    buckets of the destination (each window partition is deg/B), then top-k
    per source over the ≤ B·k survivors — so a 10M-edge hub never
    concentrates in a single sort. Randomness is a deterministic per-(edge,
    epoch) splitmix-style uniform from ``xxhash64`` (the reference's
    unseeded ``rand()`` made runs unreproducible)."""
    u01 = (
        F.pmod(F.xxhash64(SRC, DST, F.lit(epoch_seed)), F.lit(1 << 30)).cast("double")
        / F.lit(float(1 << 30))
    )
    scored = edges.withColumn("_wr", u01 * F.col("norm_sum")).withColumn(
        "_b", F.pmod(F.xxhash64(DST), F.lit(TOPK_BUCKETS))
    )
    within_bucket = Window.partitionBy(SRC, "_b").orderBy(F.desc("_wr"))
    survivors = scored.withColumn("_rn", F.row_number().over(within_bucket)).filter(
        F.col("_rn") <= k
    )
    per_src = Window.partitionBy(SRC).orderBy(F.desc("_wr"))
    return (
        survivors.withColumn("_rn2", F.row_number().over(per_src))
        .filter(F.col("_rn2") <= k)
        .drop("_wr", "_b", "_rn", "_rn2")
    )


def _normalized_edges(graph) -> "DataFrame":
    """Edges with per-src normalized weight ``norm_sum = w / Σ_src w``.

    GroupBy + join (map-side combine absorbs hub fan-out), NOT a
    ``partitionBy(src)`` window — a window puts a 10M-edge hub's entire edge
    list into one sort task. Same shape as pagerank's edge normalization
    (pagerank.py:260-264)."""
    w = graph.weight_col()
    out_w = graph.edges.groupBy(SRC).agg(F.sum(w).alias("_ow"))
    return graph.edges.join(out_w, SRC).select(
        F.col(SRC).cast("string").alias(SRC),
        F.col(DST).cast("string").alias(DST),
        (w / F.col("_ow")).alias("norm_sum"),
    )


def _walk_loop(graph, sources, num_epochs, n_sampling_edges, seed):
    npart = int(
        graph.edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # pinned + pre-partitioned on src: each epoch's walk-extension join
    # exchanges only the walk-state side, never the edge table
    edges = pin_partitioned(_normalized_edges(graph).repartition(npart, SRC))

    state = (
        graph.nodes.select(F.col(ID).cast("string").alias(ID))
        .filter(F.col(ID).isin([str(s) for s in sources]))
        .select(
            F.array(F.col(ID)).alias("path"),
            F.array(F.lit(1.0)).alias("weights"),
            F.col(ID).alias("curr"),
        )
        .localCheckpoint(eager=True)
    )

    for i in range(num_epochs):
        if n_sampling_edges:
            out_edges = _weighted_topk_edges(edges, n_sampling_edges, seed + i)
        else:
            out_edges = edges
        joined = state.join(out_edges, state["curr"] == out_edges[SRC], "left")
        appended = F.col(DST).isNotNull()
        state = joined.select(
            F.when(appended, F.concat("path", F.array(F.col(DST))))
            .otherwise(F.col("path"))
            .alias("path"),
            F.when(
                appended,
                F.concat(
                    "weights",
                    F.array(F.element_at("weights", -1) * F.col("norm_sum")),
                ),
            )
            .otherwise(F.col("weights"))
            .alias("weights"),
            F.col(DST).alias("curr"),  # null freezes dead-ended paths
        ).localCheckpoint(eager=True)

    edges.unpersist()
    return state.select(
        F.col("path").alias("random_walks"), F.col("weights").alias("weights")
    ).filter(F.col("random_walks").isNotNull())
