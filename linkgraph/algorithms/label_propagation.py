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
partition before the exchange. (Measured, interleaved A/B medians at
local[32]: struct 0.63× the window's wall on the hub-free 2.3M-edge corpus
and a tie on a degree-4M star hub — Spark 4's Partial WindowGroupLimit
makes the window top-1 map-side-bounded too, but the algebraic form still
wins or ties; see BENCH/lpa_top1_ab.md.) Per-superstep localCheckpoint
stops plan growth; one action per superstep for convergence.
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
    checkpoint=None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> DataFrame:
    """Returns DataFrame[id, label]; label is a node id (min id wins ties).

    ``checkpoint``/``resume`` mirror pagerank's and connected_components'
    resumability (north rule, BASELINE.json:14): every
    ``checkpoint_interval`` supersteps (and at convergence) the label table
    is snapshotted through a :class:`linkgraph.checkpoint.CheckpointManager`
    with the changed-label count history; ``resume=True`` continues from the
    latest snapshot, bit-exact with an uninterrupted run (synchronous LPA is
    deterministic, so the label table IS the whole superstep state)."""
    with static_plans(graph.edges.sparkSession):
        return _lpa_loop(
            graph, max_iter, weighted, checkpoint, checkpoint_interval, resume
        )


def _und_edges(graph: LinkGraph, weighted: bool):
    """Symmetrized (u, v, w) edge table shared by both LPA loops: union of
    both directions, self-loops dropped, parallel edges weight-summed.
    Caller persists/unpersists.

    Repartitioned by ``u`` BEFORE the dedup groupBy: hash(u) co-locates
    every (u, v) group (HashPartitioning(u) satisfies the aggregate's
    ClusteredDistribution(u, v)), so the groupBy runs exchange-free on the
    repartitioned layout and its output KEEPS the hash(u) partitioning the
    per-superstep join requires — ONE edge-sized exchange at build instead
    of the former two (groupBy's own hash(u, v) exchange followed by a
    repartition(u); guide §2.4 "two operations keyed the same way share
    one exchange"). Only the node-sized label table shuffles per round
    (same contract as pagerank's edges_norm, pagerank.py)."""
    w = graph.weight_col() if weighted else F.lit(1.0)
    npart = int(
        graph.edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return (
        graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"), w.alias("w"))
        .union(
            graph.edges.select(
                F.col(DST).alias("u"), F.col(SRC).alias("v"), w.alias("w")
            )
        )
        .filter(F.col("u") != F.col("v"))
        .repartition(npart, "u")
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )


def _best_labels(und: DataFrame, labels: DataFrame) -> DataFrame:
    """One superstep's label choice: most-frequent (weighted) neighbor label,
    ties to the minimum label. Both aggregates are algebraic — no window —
    so map-side combine bounds hub fan-in (see module docstring)."""
    # shuffle_hash: build the node-sized label table, stream the pinned
    # edge table — the checkpointed labels carry no statistics, so left
    # alone the planner sort-merges (sorting the edge side every
    # superstep) or hash-builds the EDGE side (guide §3.1)
    nbr = (
        und.join(labels.hint("shuffle_hash"), und["u"] == labels[ID])
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


def _lpa_loop(
    graph: LinkGraph,
    max_iter: int,
    weighted: bool,
    checkpoint=None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> DataFrame:
    und = _und_edges(graph, weighted).persist()
    start_step = 0
    history: list[dict] = []
    if resume and checkpoint is not None and checkpoint.latest_step() is not None:
        start_step = checkpoint.latest_step()
        man = checkpoint.manifest(start_step)
        labels = checkpoint.load(start_step, "labels").localCheckpoint(eager=True)
        history = man["metrics"].get("history", [])
        if man["metrics"].get("converged"):
            max_iter = 0  # nothing left to iterate
    else:
        labels = graph.nodes.select(ID, F.col(ID).alias("label")).localCheckpoint(
            eager=True
        )

    for step in range(start_step + 1, start_step + 1 + max_iter):
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
        converged = changed == 0
        # changed-label count is LPA's convergence metric (the active set)
        history.append({"step": step, "changed": int(changed)})
        if checkpoint is not None and (
            step % checkpoint_interval == 0
            or converged
            or step == start_step + max_iter
        ):
            checkpoint.save(
                step,
                {"labels": labels},
                {"converged": converged, "history": history},
            )
        if converged:
            break
    und.unpersist()
    return labels


def seeded_label_propagation(
    graph: LinkGraph,
    seeds: DataFrame,
    max_iter: int = 30,
    weighted: bool = False,
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised label spreading with hard-clamped seeds: labeled
    seed nodes keep their labels forever; every other node adopts the
    most-frequent (weighted) label among its CURRENTLY labeled neighbors,
    ties to the minimum label; nodes with no labeled neighbor stay
    unlabeled (absent from the result). Synchronous rounds until no label
    changes or ``max_iter`` (returned labels are then the last state —
    sync LPA can oscillate on bipartite structures; seeds damp but do not
    forbid it, same caveat as the classic algorithm).

    The superstep reuses :func:`_best_labels` — the same hub-safe
    min(struct) top-1 as unsupervised LPA, no windows. Returns
    DataFrame[id, label] for every node that acquired a label.

    Beyond the reference; the standard "extend known communities /
    classify the unlabeled 99%" primitive (Zhu & Ghahramani 2002,
    hard-label variant)."""
    mine = (
        seeds.select(F.col(id_col).alias(ID), F.col(label_col).alias("label"))
        # duplicate seed ids would make the full-join convergence scan pair
        # conflicting rows forever (delta never 0); resolve to min label
        .groupBy(ID)
        .agg(F.min("label").alias("label"))
        .join(graph.nodes.select(ID), ID, "left_semi")
    )
    with static_plans(graph.edges.sparkSession):
        und = _und_edges(graph, weighted).persist()
        clamped = mine.localCheckpoint(eager=True)
        labels = clamped
        for _ in range(max_iter):
            best = _best_labels(und, labels)
            free = best.join(clamped, best["v"] == clamped[ID], "left_anti")
            staged = (
                clamped.select(ID, "label")
                .unionByName(free.select(F.col("v").alias(ID), F.col("_new").alias("label")))
                .localCheckpoint(eager=False)
            )
            # convergence: same (id, label) set as last round — ONE full-join
            # scan (null-safe label compare catches adds, drops, and flips)
            delta = (
                staged.select(ID, F.col("label").alias("_a"))
                .join(
                    labels.select(ID, F.col("label").alias("_b")), ID, "full"
                )
                .filter(~F.col("_a").eqNullSafe(F.col("_b")))
                .count()
            )
            labels = staged
            if delta == 0:
                break
        und.unpersist()
    return labels
