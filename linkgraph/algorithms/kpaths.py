"""k lightest walks — per-node top-k walk weights from a source.

NOT present in the reference (single shortest paths only, via GraphFrames
BFS); added because alternative-route analysis on a link graph needs more
than the single lightest path: "how much worse is the second-best import
chain", "is this dependency reachable robustly or only through one cheap
route". The k=1 column of the result IS weighted SSSP.

Semantics: ``walk_weights[v]`` = the k smallest total weights over WALKS
(vertex/edge revisits allowed) from ``source`` to ``v`` using at most
``max_hops`` edges, sorted ascending, duplicates kept (two distinct walks
of equal weight occupy two slots). Walks — not simple paths — because
walks make the relaxation EXACT under per-node top-k pruning: the prefix
of the i-th lightest ≤h-hop walk to v is always among the i lightest
≤(h−1)-hop walks to its penultimate node (extending any k lighter prefixes
by the same final edge would give k lighter distinct walks to v), so the
beam loses nothing. Simple-path top-k (Yen's) is inherently sequential.
If the state reaches a fixpoint before ``max_hops`` rounds, that answer
is also the unbounded-length answer (positive weights ⇒ longer walks only
get heavier).

Distributed shape: the SSSP skeleton with an array-valued state. Each
superstep is one frontier-style join against the pinned edge table, one
explode, one per-node top-k (rank-limited window — Spark plans it as a
map-side Partial WindowGroupLimit, the engine's blessed bounded top-k
form, never a full per-node sort beyond k), and one bounded
``collect_list`` (≤ k values per node). State is node × k, rounds ≤
``max_hops`` with early fixpoint exit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def _topk_fold(cand: DataFrame, k: int) -> DataFrame:
    """Per-node top-k of (id, val) candidates folded to (id, ws array) —
    factored out so the plan-audit test asserts the REAL superstep plans as
    a map-side Partial WindowGroupLimit (rank-limited window + filter),
    never a full per-node sort."""
    win = Window.partitionBy(ID).orderBy(F.asc("val"))
    return (
        cand.withColumn("_r", F.row_number().over(win))
        .filter(F.col("_r") <= k)
        .groupBy(ID)
        .agg(F.sort_array(F.collect_list("val")).alias("ws"))
    )


def k_lightest_walks(
    graph: LinkGraph,
    source,
    k: int = 3,
    max_hops: int = 20,
) -> DataFrame:
    """DataFrame[id, walk_weights: array<double>] — the k smallest walk
    weights source→id using at most ``max_hops`` edges (ascending; shorter
    than k when fewer walks exist; nodes unreachable within the bound get
    no row... except the source itself, which always carries the empty
    walk 0.0). Requires strictly positive weights (a zero/negative-weight
    cycle makes "k lightest walks" undefined)."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if max_hops <= 0:
        raise ValueError(f"max_hops must be > 0, got {max_hops}")
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    bad = graph.edges.filter(graph.weight_col() <= 0)
    if bad.limit(1).count() > 0:
        raise ValueError(
            "k_lightest_walks requires strictly positive edge weights "
            "(a non-positive cycle makes the k lightest walks undefined)"
        )

    with static_plans(spark):
        edges = pin_partitioned(
            graph.edges.select(
                F.col(SRC).alias("u"),
                F.col(DST).alias("v"),
                graph.weight_col().alias("w"),
            )
            .groupBy("u", "v")
            # simple-graph semantics: parallel edges collapse to the
            # lightest (same contract as the engine's other weighted ops —
            # a heavier parallel edge IS a distinct walk in multigraph
            # semantics, which this operator does not model)
            .agg(F.min("w").alias("w"))
            .repartition(npart, "u")
        )
        id_t = graph.nodes.schema[ID].dataType.simpleString()
        # phantom-source restriction (same left_semi convention as
        # shortest_paths_weighted, sssp.py): a source absent from the
        # graph must yield zero rows, not a fabricated [0.0] row
        # (ADVICE r4).
        state = (
            spark.createDataFrame([(source,)], f"{ID} {id_t}")
            .join(graph.nodes.select(ID), ID, "left_semi")
            .select(ID, F.array(F.lit(0.0)).alias("ws"))
            .localCheckpoint(eager=True)
        )
        # the exact DP is S_h[v] = top-k({0 if v=source} ⊎ extensions of
        # S_{h-1}); unioning S_{h-1}[v] itself would DOUBLE-COUNT — every
        # non-empty top-k walk is regenerated through its own prefix
        # (which stays top-k at its end node, else k lighter extensions
        # would displace the walk here), so only the empty walk at the
        # source needs explicit re-seeding
        # restricted like `state`: a phantom source must not be re-seeded
        # into every iteration's candidate union either. Derived from the
        # CHECKPOINTED state (which is exactly the validated source row)
        # rather than re-joining graph.nodes — the seed rides every
        # superstep's candidate union, and a lazy left_semi against
        # inferred nodes would re-run the distinct-over-all-edges node
        # derivation once per hop.
        seed = state.select(ID, F.lit(0.0).alias("val"))
        for _ in range(max_hops):
            ext = (
                state.join(edges, state[ID] == edges["u"])
                .select(
                    F.col("v").alias(ID),
                    F.explode(
                        F.transform("ws", lambda x: x + F.col("w"))
                    ).alias("val"),
                )
            )
            cand = ext.unionByName(seed)
            nxt = _topk_fold(cand, k).localCheckpoint(eager=True)
            changed = (
                nxt.join(
                    state.withColumnRenamed("ws", "_old"), ID, "left"
                )
                .filter(
                    F.col("_old").isNull() | (F.col("ws") != F.col("_old"))
                )
                .limit(1)
                .count()
            )
            state = nxt
            if changed == 0:
                break
        edges.unpersist()
    return state.select(ID, F.col("ws").alias("walk_weights"))
