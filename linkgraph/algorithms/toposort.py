"""Topological layering — longest-path DAG levels, with cycle detection.

NOT present in the reference (no DAG utilities at all in
``mercury/graph``); added because dependency scheduling over code/link
graphs (build order, import depth, data-lineage staging) is a core
link-graph workload and needs layer assignment, not just reachability.

layer(v) = 0 for every node with no in-edges; otherwise
layer(v) = 1 + max(layer(u)) over in-edges u→v — the longest path from
any source, i.e. the earliest wave in which v can run once all
dependencies ran.

Distributed plan: Bellman-Ford-max supersteps, the same frontier-pruned
rank-side-only-shuffle shape as ``sssp.py`` — edges distinct-aggregated
once, hash-partitioned by src, persisted; every node starts at layer 0
and only nodes whose layer IMPROVED feed the next relaxation. The round
count is bounded by the longest path length; a graph with a cycle keeps
improving past N rounds, which is the cycle detector (raises, same
contract as networkx ``topological_sort``'s NetworkXUnfeasible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def topological_layers(graph: LinkGraph, max_depth: int | None = None) -> DataFrame:
    """DataFrame[id, layer] — longest-path level per node (0 = sources).

    Raises ``ValueError`` on a cyclic graph (detected when relaxation is
    still improving after N supersteps, N = node count — a DAG's longest
    path has at most N−1 edges). ``max_depth`` caps the superstep budget
    below N for graphs known shallow (cheaper cycle detection: anything
    deeper than the cap raises early).
    """
    if graph.is_directed is False:
        raise ValueError(
            "topological_layers requires a directed graph (an undirected "
            "edge is a 2-cycle)"
        )
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = graph.number_of_nodes()
    budget = max_depth if max_depth is not None else n
    with static_plans(spark):
        # pin, don't checkpoint: keeps hash(u) visible so each round
        # exchanges only the node-sized frontier (session.pin_partitioned)
        edges = pin_partitioned(
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .distinct()
            .repartition(npart, "u")
        )
        try:
            layer = graph.nodes.select(ID, F.lit(0).alias("layer")).localCheckpoint(
                eager=True
            )
            frontier = layer
            for _ in range(budget + 1):
                cand = (
                    # shuffle_hash: build the frontier, stream pinned edges
                    frontier.hint("shuffle_hash")
                    .join(edges, frontier[ID] == edges["u"])
                    .select(F.col("v").alias(ID), (F.col("layer") + 1).alias("l"))
                    .groupBy(ID)
                    .agg(F.max("l").alias("l"))
                )
                merged = layer.join(cand, ID, "left").select(
                    ID,
                    F.greatest("layer", F.coalesce("l", F.lit(0))).alias("layer"),
                    (
                        F.col("l").isNotNull() & (F.col("l") > F.col("layer"))
                    ).alias("_imp"),
                ).localCheckpoint(eager=False)
                n_imp = merged.filter("_imp").count()  # materializes the round
                layer = merged.select(ID, "layer")
                if n_imp == 0:
                    return layer
                frontier = merged.filter("_imp").select(ID, "layer").localCheckpoint(
                    eager=False
                )
        finally:
            edges.unpersist()
    raise ValueError(
        f"graph is not a DAG (layers still improving after {budget + 1} "
        "supersteps)"
        if max_depth is None
        else f"longest path exceeds max_depth={max_depth} (or graph has a "
        "cycle)"
    )


def critical_path(
    graph: LinkGraph,
    durations: DataFrame,
    id_col: str = "id",
    duration_col: str = "duration",
    max_depth: int | None = None,
) -> DataFrame:
    """Critical-path method (CPM) over a DAG with per-node durations —
    DataFrame[id, earliest_finish, critical_pred].

        ef(v)  = dur(v) + max(ef(u)) over in-edges u→v   (sources: dur(v))
        critical_pred(v) = the argmax predecessor (max ef, ties → min id;
                           NULL for sources)

    so max(earliest_finish) is the schedule makespan and following
    ``critical_pred`` back from the argmax node walks the critical path.
    The workload this serves on a source-repo link graph: build/stage
    scheduling — "which dependency chain bounds the total build".

    Same distributed shape as :func:`topological_layers`: max-relaxation
    supersteps with a frontier of improved nodes only, edges
    distinct-aggregated once and hash-partitioned by src so each round
    shuffles only the frontier; round count is bounded by the longest path
    (cycle ⇒ still improving after N rounds ⇒ raises). Nodes absent from
    ``durations`` get duration 0; negative durations are rejected (they
    break the extend-backwards-never-hurts invariant the relaxation — and
    any CPM — relies on).
    """
    if graph.is_directed is False:
        raise ValueError("critical_path requires a directed acyclic graph")
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = graph.number_of_nodes()
    budget = max_depth if max_depth is not None else n
    dur = durations.select(
        F.col(id_col).alias(ID),
        F.col(duration_col).cast("double").alias("_dur"),
    )
    with static_plans(spark):
        neg = dur.filter(F.col("_dur") < 0).limit(1).count()
        if neg:
            raise ValueError("critical_path requires non-negative durations")
        # pin, don't checkpoint: keeps hash(u) visible so each round
        # exchanges only the node-sized frontier (session.pin_partitioned)
        edges = pin_partitioned(
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .distinct()
            .repartition(npart, "u")
        )
        state = (
            graph.nodes.select(ID)
            .join(dur, ID, "left")
            .select(
                ID,
                F.coalesce("_dur", F.lit(0.0)).alias("_dur"),
                F.coalesce("_dur", F.lit(0.0)).alias("ef"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = state.select(ID, "ef")
        for _ in range(budget + 1):
            # best incoming finish per head: algebraic max, no window
            cand = (
                # shuffle_hash: build the frontier, stream the pinned edges
                frontier.hint("shuffle_hash")
                .join(edges, frontier[ID] == edges["u"])
                .groupBy("v")
                .agg(F.max("ef").alias("_in"))
            )
            merged = (
                state.join(cand, state[ID] == cand["v"], "left")
                .select(
                    ID,
                    "_dur",
                    F.greatest(
                        "ef", F.coalesce(F.col("_dur") + F.col("_in"), F.col("ef"))
                    ).alias("ef"),
                    (
                        F.col("_in").isNotNull()
                        & (F.col("_dur") + F.col("_in") > F.col("ef"))
                    ).alias("_imp"),
                )
                .localCheckpoint(eager=False)
            )
            n_imp = merged.filter("_imp").count()  # materializes the round
            state = merged.select(ID, "_dur", "ef")
            if n_imp == 0:
                # fixpoint post-pass: critical_pred(v) = min id among
                # in-neighbors u whose FINAL ef is maximal — defined on the
                # converged table, so tie-breaks don't depend on which round
                # a predecessor's value arrived in. min(struct(-ef, u)) is
                # the windowless argmax-with-min-id-ties top-1.
                best_in = (
                    state.select(ID, "ef")
                    .join(edges, state[ID] == edges["u"])
                    .groupBy("v")
                    .agg(
                        F.min(
                            F.struct(
                                (-F.col("ef")).alias("nf"),
                                F.col("u").alias("p"),
                            )
                        ).alias("_b")
                    )
                    .select(F.col("v"), F.col("_b.p").alias("_pred"))
                )
                out = state.join(
                    best_in, state[ID] == best_in["v"], "left"
                ).select(
                    ID,
                    F.col("ef").alias("earliest_finish"),
                    F.col("_pred").alias("critical_pred"),
                ).localCheckpoint(eager=True)  # sever before edges release
                edges.unpersist()
                return out
            frontier = (
                merged.filter("_imp").select(ID, "ef").localCheckpoint(eager=False)
            )
    edges.unpersist()
    raise ValueError(
        f"graph is not a DAG (earliest finish still improving after "
        f"{budget + 1} supersteps)"
    )
