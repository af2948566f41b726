"""Feature propagation — k rounds of graph feature smoothing (SGC-style).

NOT in the reference; the standard GNN preprocessing / label-spreading
primitive: X' = (1−α)·X + α·mean over in-neighbors of X, iterated k
times. Used to densify sparse node features, smooth embeddings along the
link structure, and as the training-free baseline for node classification
(Wu et al., "Simplifying Graph Convolutional Networks", ICML'19).

Distributed shape: features live EXPLODED as (id, dim, value) rows —
(V·d) rows, the natural width-independent layout — so each round is one
join of the edge table to the feature table plus two algebraic groupBys
(neighbor mean per (node, dim), then the α-blend via a full join back).
No windows, no UDFs, no arrays collected until the caller asks for them.
Nodes with no in-neighbors keep their own features (the mean side is
absent, the blend coalesces to X).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def explode_features(
    features: DataFrame, id_col: str = "id", feat_col: str = "features"
) -> DataFrame:
    """(id, dim, value) long layout from an array column."""
    return features.select(
        F.col(id_col).alias(ID), F.posexplode(feat_col).alias("dim", "value")
    ).withColumn("value", F.col("value").cast("double"))


def assemble_features(
    long_df: DataFrame, out_col: str = "features"
) -> DataFrame:
    """Inverse of :func:`explode_features`: (id, features array) with dims
    in order — one doc-bounded sort aggregate per node."""
    return long_df.groupBy(ID).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "value"))),
            lambda s: s["value"],
        ).alias(out_col)
    )


def feature_propagation(
    graph: LinkGraph,
    features: DataFrame,
    iterations: int = 2,
    alpha: float = 0.5,
    id_col: str = "id",
    feat_col: str = "features",
    assemble: bool = True,
) -> DataFrame:
    """Smooth node features along edge direction for ``iterations`` rounds:
    each round every node's vector becomes (1−α)·own + α·(mean of its
    in-neighbors' vectors), nodes without in-neighbors (or whose neighbors
    carry no features) keep their own. Returns (id, features array) —
    or the long (id, dim, value) layout with ``assemble=False`` (the
    round-trip-free form for chaining into similarity search).

    Features may cover a subset of nodes; uncovered nodes contribute
    nothing and receive nothing (restrict or zero-fill upstream)."""
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        # pinned (not checkpointed) so hash(u) stays visible to Catalyst:
        # each round exchanges only the node×dim state, never the edges
        edges = pin_partitioned(
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .distinct()
            .repartition(npart, "u")
        )
        x = explode_features(features, id_col, feat_col).localCheckpoint(
            eager=True
        )
        for _ in range(iterations):
            nbr = (
                x.join(edges, x[ID] == edges["u"])
                .groupBy(F.col("v").alias(ID), F.col("dim"))
                .agg(F.avg("value").alias("nmean"))
            )
            x = (
                x.join(nbr, [ID, "dim"], "left")
                .select(
                    ID,
                    "dim",
                    F.when(
                        F.col("nmean").isNotNull(),
                        F.lit(1.0 - alpha) * F.col("value")
                        + F.lit(alpha) * F.col("nmean"),
                    )
                    .otherwise(F.col("value"))
                    .alias("value"),
                )
                .localCheckpoint(eager=False)
            )
        # materialize before releasing the pinned edges (the per-round
        # checkpoints above are lazy — nothing inside the loop forces them)
        x = x.localCheckpoint(eager=True)
        edges.unpersist()
    return assemble_features(x, feat_col) if assemble else x
