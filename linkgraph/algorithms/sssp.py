"""Weighted single/multi-source shortest paths — Bellman-Ford supersteps.

NOT present in the reference (its distances are hop counts via GraphFrames
``shortestPaths``, ``mercury/graph/core/graph.py:656-671`` — unweighted
only); added because a weighted-graph engine without weighted distances
pushes every routing/cost workload back to the user.

Distributed plan: the classic Bellman-Ford relaxation expressed as one
superstep join —

    cand(v) = min over in-edges (u,v,w) of dist(u) + w
    dist'   = min(dist, cand)

iterated to fixpoint. Frontier-pruned: only nodes whose distance IMPROVED
last round feed the next relaxation (the textbook queue-based refinement),
so supersteps touch the active frontier, not all settled state. Edges are
hash-partitioned by src once and PINNED via ``session.pin_partitioned``
(persist keeps the repartition visible to Catalyst; a localCheckpoint
would degrade to an unknown-partitioning RDD scan and re-exchange the
edge table every round) — only the frontier shuffles, the same
rank-side-only-shuffle shape as pagerank/SCC. Convergence is the improved
count reaching zero, read from the SAME aggregate that materializes the
superstep (one action per round).

Weights must be non-negative (checked lazily: negative-cycle divergence
hits ``max_iter`` and raises; plain negative edges without cycles still
converge to correct Bellman-Ford answers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def _relax_round(dist: DataFrame, frontier: DataFrame, edges: DataFrame) -> DataFrame:
    """One Bellman-Ford superstep: relax the frontier's out-edges, min-merge
    into ``dist``, and flag improvements. Pure dataflow (factored out so the
    plan-audit tests can assert it stays algebraic and window-free)."""
    cand = (
        # shuffle_hash: build the frontier, stream the pinned edges
        frontier.hint("shuffle_hash").join(edges, frontier[ID] == edges["u"])
        .select(F.col("v").alias(ID), (F.col("dist") + F.col("w")).alias("d"))
        .groupBy(ID)
        .agg(F.min("d").alias("d"))
    )
    return dist.join(cand, ID, "full").select(
        ID,
        F.least(
            F.coalesce("dist", F.lit(float("inf"))),
            F.coalesce("d", F.lit(float("inf"))),
        ).alias("dist"),
        (
            F.col("d").isNotNull()
            & (F.col("d") < F.coalesce("dist", F.lit(float("inf"))))
        ).alias("_imp"),
    )


def shortest_paths_weighted(
    graph: LinkGraph,
    sources: DataFrame | list,
    max_iter: int = 200,
) -> DataFrame:
    """DataFrame[id, dist] — minimum edge-weight sum from the NEAREST source
    along edge direction (undirected graphs already materialize both
    directions). Unreachable nodes get no row (join/zero-fill is the
    caller's policy choice). Multi-source by construction: pass one source
    for classic SSSP, many for the nearest-facility pattern."""
    spark = graph.edges.sparkSession
    if isinstance(sources, list):
        if not sources:
            raise ValueError("sources must be non-empty")
        src_df = spark.createDataFrame([(x,) for x in sources], [ID])
    else:
        src_df = sources.select(F.col(sources.columns[0]).alias(ID))
    # phantom sources (ids not in the graph) must not seed distance 0 —
    # same restriction convention as scc/cc/betweenness
    src_df = src_df.join(graph.nodes.select(ID), ID, "left_semi")
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = graph.weight_col()
    with static_plans(spark):
        edges = pin_partitioned(
            graph.edges.select(
                F.col(SRC).alias("u"), F.col(DST).alias("v"),
                w.cast("double").alias("w"),
            )
            .groupBy("u", "v")
            .agg(F.min("w").alias("w"))  # parallel edges: keep the cheapest
            .repartition(npart, "u")
        )
        dist = src_df.select(ID, F.lit(0.0).alias("dist")).distinct()
        dist = dist.localCheckpoint(eager=True)
        frontier = dist
        for _ in range(max_iter):
            merged = _relax_round(dist, frontier, edges).localCheckpoint(eager=False)
            n_imp = merged.filter("_imp").count()  # materializes the round
            if n_imp == 0:
                dist = merged.select(ID, "dist")
                break
            frontier = merged.filter("_imp").select(ID, "dist").localCheckpoint(
                eager=False
            )
            dist = merged.select(ID, "dist")
        else:
            edges.unpersist()
            raise RuntimeError(
                f"shortest_paths_weighted did not converge within "
                f"max_iter={max_iter} supersteps — negative cycle, or raise "
                "max_iter (rounds are bounded by the weighted-path hop count)"
            )
        edges.unpersist()
    # restrict to the caller's node table (parity with scc/cc/closeness:
    # outside endpoints shape reachability but emit no output row)
    return dist.join(graph.nodes.select(ID), ID, "left_semi")


def shortest_path_lengths_weighted(
    graph: LinkGraph,
    landmarks: DataFrame | list | None = None,
    max_iter: int = 200,
    max_all_pairs_nodes: int = 100_000,
) -> DataFrame:
    """DataFrame[id, landmark, dist] — minimum edge-weight sum id→landmark
    along edge direction: the weighted analogue of
    :func:`linkgraph.algorithms.closeness.shortest_path_lengths` (same
    orientation, landmark and size-guard semantics; Bellman-Ford relaxation
    instead of hop BFS). State is keyed (id, landmark), so k landmarks cost
    O(k·V) state like the hop version — relaxation runs along REVERSED
    edges (a node improves from its successors), frontier-pruned."""
    spark = graph.edges.sparkSession
    if landmarks is None:
        n = graph.number_of_nodes()
        if n > max_all_pairs_nodes:
            raise ValueError(
                f"all-pairs weighted distances (landmarks=None) is O(V·E); "
                f"graph has {n} nodes > max_all_pairs_nodes="
                f"{max_all_pairs_nodes}. Pass a landmark sample."
            )
        lm = graph.nodes.select(F.col(ID).alias("landmark"))
    elif isinstance(landmarks, list):
        if not landmarks:
            raise ValueError("landmarks must be non-empty")
        lm = spark.createDataFrame([(x,) for x in landmarks], ["landmark"])
    else:
        lm = landmarks.select(F.col(landmarks.columns[0]).alias("landmark"))
    lm = lm.distinct().join(
        graph.nodes.select(F.col(ID).alias("landmark")), "landmark", "left_semi"
    )

    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = graph.weight_col()
    with static_plans(spark):
        # reversed orientation: dist(u → landmark) improves via out-edge
        # (u, v): cand = w(u,v) + dist(v → landmark)
        rev = pin_partitioned(
            graph.edges.select(
                F.col(DST).alias("v"), F.col(SRC).alias("u"),
                w.cast("double").alias("w"),
            )
            .groupBy("v", "u")
            .agg(F.min("w").alias("w"))
            .repartition(npart, "v")
        )
        dist = lm.select(
            F.col("landmark").alias(ID), "landmark", F.lit(0.0).alias("dist")
        ).localCheckpoint(eager=True)
        frontier = dist
        for _ in range(max_iter):
            cand = (
                frontier.hint("shuffle_hash").join(rev, frontier[ID] == rev["v"])
                .select(
                    F.col("u").alias(ID), "landmark",
                    (F.col("dist") + F.col("w")).alias("d"),
                )
                .groupBy(ID, "landmark")
                .agg(F.min("d").alias("d"))
            )
            merged = (
                dist.join(cand, [ID, "landmark"], "full")
                .select(
                    ID,
                    "landmark",
                    F.least(
                        F.coalesce("dist", F.lit(float("inf"))),
                        F.coalesce("d", F.lit(float("inf"))),
                    ).alias("dist"),
                    (
                        F.col("d").isNotNull()
                        & (F.col("d") < F.coalesce("dist", F.lit(float("inf"))))
                    ).alias("_imp"),
                )
                .localCheckpoint(eager=False)
            )
            n_imp = merged.filter("_imp").count()
            if n_imp == 0:
                dist = merged.select(ID, "landmark", "dist")
                break
            frontier = merged.filter("_imp").select(ID, "landmark", "dist")
            frontier = frontier.localCheckpoint(eager=False)
            dist = merged.select(ID, "landmark", "dist")
        else:
            rev.unpersist()
            raise RuntimeError(
                f"shortest_path_lengths_weighted did not converge within "
                f"max_iter={max_iter} supersteps — negative cycle, or raise "
                "max_iter"
            )
        rev.unpersist()
    return dist.join(graph.nodes.select(ID), ID, "left_semi")


def weighted_closeness_centrality(
    graph: LinkGraph,
    landmarks: DataFrame | list | None = None,
    max_iter: int = 200,
) -> DataFrame:
    """DataFrame[id, closeness] = (N−1) / Σ_landmark weighted-dist(id →
    landmark) — the weighted analogue of the reference's closeness
    (``mercury/graph/core/graph.py:656-671``, which is hop-count only).
    Unreached landmarks contribute nothing; nodes reaching none get 0.0
    (same deviation the hop version documents)."""
    n = graph.number_of_nodes()
    dists = shortest_path_lengths_weighted(graph, landmarks, max_iter)
    sums = dists.groupBy(ID).agg(F.sum("dist").alias("_s"))
    return (
        graph.nodes.select(ID)
        .join(sums, ID, "left")
        .select(
            ID,
            F.when(
                F.coalesce(F.col("_s"), F.lit(0.0)) > 0,
                F.lit(float(n - 1)) / F.col("_s"),
            )
            .otherwise(F.lit(0.0))
            .alias("closeness"),
        )
    )


def shortest_path_tree(
    graph: LinkGraph,
    source,
    max_iter: int = 200,
) -> DataFrame:
    """DataFrame[id, dist, parent] — the single-source shortest-path TREE:
    besides the distance, each reached node carries the predecessor on a
    cheapest path from ``source`` (the source itself has parent NULL).
    This is the "show me the actual route" companion to
    :func:`shortest_paths_weighted`, which only returns distances.

    Ties are deterministic: among equal-cost predecessors the minimum
    parent id wins, enforced by an ALGEBRAIC ``min(struct(d, parent))``
    aggregate per superstep — no window, no nondeterministic first().

    Same frontier-pruned Bellman-Ford plan as ``shortest_paths_weighted``
    (one join + min-struct aggregate + full-outer merge per superstep,
    edges pinned src-partitioned, only the frontier shuffles). Use
    :func:`reconstruct_path` to walk routes out of the tree."""
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = graph.weight_col()
    with static_plans(spark):
        edges = pin_partitioned(
            graph.edges.select(
                F.col(SRC).alias("u"), F.col(DST).alias("v"),
                w.cast("double").alias("w"),
            )
            .groupBy("u", "v")
            .agg(F.min("w").alias("w"))
            .repartition(npart, "u")
        )
        id_t = graph.nodes.schema[ID].dataType.simpleString()
        state = (
            spark.createDataFrame([(source,)], f"{ID} {id_t}")
            .join(graph.nodes.select(ID), ID, "left_semi")
            .select(
                ID,
                F.lit(0.0).alias("dist"),
                F.lit(None).cast(id_t).alias("parent"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = state
        for _ in range(max_iter):
            cand = (
                frontier.hint("shuffle_hash").join(edges, frontier[ID] == edges["u"])
                .select(
                    F.col("v").alias(ID),
                    F.struct(
                        (F.col("dist") + F.col("w")).alias("d"),
                        F.col("u").alias("p"),
                    ).alias("dp"),
                )
                .groupBy(ID)
                .agg(F.min("dp").alias("dp"))  # (min d, then min parent id)
            )
            merged = (
                state.join(cand, ID, "full")
                .select(
                    ID,
                    F.when(
                        F.col("dp").isNotNull()
                        & (
                            F.col("dist").isNull()
                            | (F.col("dp.d") < F.col("dist"))
                            | (
                                (F.col("dp.d") == F.col("dist"))
                                & (F.col("dp.p") < F.col("parent"))
                            )
                        ),
                        F.struct(
                            F.col("dp.d").alias("dist"),
                            F.col("dp.p").alias("parent"),
                            F.lit(True).alias("imp"),
                        ),
                    )
                    .otherwise(
                        F.struct(
                            F.col("dist"),
                            F.col("parent"),
                            F.lit(False).alias("imp"),
                        )
                    )
                    .alias("s"),
                )
                .select(ID, "s.dist", "s.parent", F.col("s.imp").alias("_imp"))
                .localCheckpoint(eager=False)
            )
            n_imp = merged.filter("_imp").count()
            if n_imp == 0:
                state = merged.select(ID, "dist", "parent")
                break
            frontier = merged.filter("_imp").select(ID, "dist").localCheckpoint(
                eager=False
            )
            state = merged.select(ID, "dist", "parent")
        else:
            edges.unpersist()
            raise RuntimeError(
                f"shortest_path_tree did not converge within max_iter="
                f"{max_iter} supersteps — negative cycle, or raise max_iter"
            )
        edges.unpersist()
    return state.join(graph.nodes.select(ID), ID, "left_semi")


def reconstruct_path(tree: DataFrame, target, max_hops: int = 1_000) -> list:
    """The route source→``target`` as a list of node ids, walked out of a
    :func:`shortest_path_tree` result by following parent pointers.

    One filtered single-row lookup per hop — NEVER a full-tree collect
    (the tree is node-sized; a route is human-sized). Persist the tree
    first when walking several routes, so each hop is a cached point
    lookup; reconstructing a LARGE batch of routes belongs in an iterative
    self-join against the tree, not a loop over this. Returns [] when
    ``target`` has no row (unreachable); ``max_hops`` guards against a
    corrupt (cyclic) parent table."""
    idc = tree.columns[0]
    path = [target]
    cur = target
    for _ in range(max_hops):
        row = tree.filter(F.col(idc) == cur).select("parent").limit(1).collect()
        if not row:
            if cur == target:
                return []  # unreachable
            raise RuntimeError(
                f"parent {cur!r} has no tree row — corrupt tree?"
            )
        parent = row[0]["parent"]
        if parent is None:
            return path[::-1]
        path.append(parent)
        cur = parent
    raise RuntimeError(
        f"parent chain exceeded max_hops={max_hops} — corrupt tree?"
    )
