"""Label propagation community detection (synchronous LPA), from scratch.

NOT present in the reference (no labelPropagation call anywhere under
``mercury/`` — GraphFrames exposes it but ``Graph`` never uses it); required
by the north rule (BASELINE.json:6,14). Semantics: synchronous updates —
every node simultaneously adopts the most frequent label among its neighbors
(undirected view), ties broken by minimum label; converges when no label
changes or ``max_iter`` is hit. Deterministic by construction (no random
order), so results are reproducible and testable.

Dataflow per superstep (SURVEY.md A14):
    labels ⋈ edges → groupBy(dst, label).sum(weight)
    → row_number over (partitionBy(dst) orderBy(desc(cnt), asc(label))) = 1

Scale notes: the heavy agg is algebraic (map-side combine handles hub fan-in);
the top-1 window partitions by node so no global sort; per-superstep
localCheckpoint stops plan growth; one action per superstep for convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


def label_propagation(
    graph: LinkGraph,
    max_iter: int = 20,
    weighted: bool = False,
) -> DataFrame:
    """Returns DataFrame[id, label]; label is a node id (min id wins ties)."""
    with static_plans(graph.edges.sparkSession):
        return _lpa_loop(graph, max_iter, weighted)


def _lpa_loop(graph: LinkGraph, max_iter: int, weighted: bool) -> DataFrame:
    w = graph.weight_col() if weighted else F.lit(1.0)
    und = (
        graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"), w.alias("w"))
        .union(
            graph.edges.select(
                F.col(DST).alias("u"), F.col(SRC).alias("v"), w.alias("w")
            )
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    labels = graph.nodes.select(ID, F.col(ID).alias("label")).localCheckpoint(
        eager=True
    )

    top1 = Window.partitionBy("v").orderBy(F.desc("wsum"), F.asc("label"))
    for _ in range(max_iter):
        nbr = (
            und.join(labels, und["u"] == labels[ID])
            .groupBy("v", "label")
            .agg(F.sum("w").alias("wsum"))
        )
        best = (
            nbr.withColumn("_rn", F.row_number().over(top1))
            .filter(F.col("_rn") == 1)
            .select(F.col("v"), F.col("label").alias("_new"))
        )
        # carry the old label through: convergence check is a scan, no join
        staged = labels.join(best, labels[ID] == best["v"], "left").select(
            ID,
            F.col("label").alias("_old"),
            F.coalesce("_new", "label").alias("label"),
        )
        staged = staged.localCheckpoint(eager=False)
        changed = (
            staged.agg(
                F.sum(F.when(F.col("label") != F.col("_old"), 1).otherwise(0))
            ).collect()[0][0]
            or 0
        )
        labels = staged.select(ID, "label")
        if changed == 0:
            break
    und.unpersist()
    return labels
