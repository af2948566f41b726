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
    → groupBy(dst).min(struct(-wsum, label))   [desc weight, asc label]

Scale notes: both aggs are algebraic, so map-side combine bounds hub fan-in
at every stage — in the FIRST supersteps every neighbor label is distinct,
so a 10M-degree hub has 10M candidate rows; the former
row_number over (partitionBy(v)) top-1 sorted all of them in one task,
whereas the min(struct) partial-agg collapses them to one row per upstream
partition before the exchange. (Measured cost at 2.3M edges/no hubs: the
struct agg is ~1.2-1.5× the window's wall — the price of hub safety; see
BENCH/lpa_top1_ab.md.) Per-superstep localCheckpoint stops plan growth;
one action per superstep for convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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


def _best_labels(und: DataFrame, labels: DataFrame) -> DataFrame:
    """One superstep's label choice: most-frequent (weighted) neighbor label,
    ties to the minimum label. Both aggregates are algebraic — no window —
    so map-side combine bounds hub fan-in (see module docstring)."""
    nbr = (
        und.join(labels, und["u"] == labels[ID])
        .groupBy("v", "label")
        .agg(F.sum("w").alias("wsum"))
    )
    # hub-safe top-1: min(struct(-wsum, label)) ≡ (desc wsum, asc label)
    return (
        nbr.groupBy("v")
        .agg(
            F.min(
                F.struct((-F.col("wsum")).alias("nw"), F.col("label").alias("l"))
            ).alias("_b")
        )
        .select(F.col("v"), F.col("_b.l").alias("_new"))
    )


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

    for _ in range(max_iter):
        best = _best_labels(und, labels)
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
