"""Betweenness centrality — driver-local exact plus distributed sampled.

The reference is networkx-only here with the comment that the algorithm "is
too computationally expensive to use on large graphs"
(``mercury/graph/core/graph.py:673-679``); no distributed path exists in the
reference. ``betweenness_centrality`` keeps that driver-local exact path
(size-guarded). ``betweenness_sampled`` goes beyond the reference: the
standard source-sampled Brandes estimator (Brandes & Pich, "Centrality
estimation in large networks", 2007) expressed as level-synchronous
DataFrame supersteps — a forward multi-source BFS that counts shortest paths
(sigma) per (source, node), then a backward per-level dependency sweep — so
it runs distributed with one bounded join per level and scales with the
number of sampled sources, not |V|².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def betweenness_centrality(
    graph: LinkGraph, max_nodes: int = 50_000, normalized: bool = True
) -> DataFrame:
    n = graph.number_of_nodes()
    if n > max_nodes:
        raise ValueError(
            f"betweenness is driver-local (O(V*E)); graph has {n} nodes > "
            f"max_nodes={max_nodes}. Use pagerank/closeness at scale."
        )
    try:
        import networkx as nx
    except ImportError as e:  # pragma: no cover
        raise ImportError("betweenness_centrality requires networkx") from e

    g = nx.DiGraph() if graph.is_directed else nx.Graph()
    g.add_nodes_from(r[ID] for r in graph.nodes.select(ID).collect())
    w = graph.weight_col()
    for r in graph.edges.select(SRC, DST, w.alias("w")).collect():
        g.add_edge(r[SRC], r[DST], weight=r["w"])
    bc = nx.betweenness_centrality(g, normalized=normalized)
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(k, float(v)) for k, v in bc.items()], [ID, "betweenness"]
    )


def _forward_level(frontier: DataFrame, fwd: DataFrame, seen: DataFrame) -> DataFrame:
    """One forward-BFS superstep: expand the frontier along ``fwd``, sum
    shortest-path counts per (source, node), drop already-settled pairs.
    Factored out for the plan-audit tests (algebraic, window-free)."""
    # shuffle_hash: build the (source, node) frontier, stream the pinned
    # edge table (guide §3.1 — the checkpointed frontier has no stats)
    return (
        frontier.hint("shuffle_hash").join(fwd, frontier[ID] == fwd["u"])
        .select("s", F.col("v").alias(ID), "sigma")
        .groupBy("s", ID)
        .agg(F.sum("sigma").alias("sigma"))
        .join(seen, ["s", ID], "left_anti")
    )


def _backward_contribs(w: DataFrame, rev: DataFrame, prev: DataFrame) -> DataFrame:
    """Per-DAG-edge dependency terms for one backward superstep:
    [s, u, v, _c] with _c = σ_u · (1 + δ_v) / σ_v for every BFS-DAG edge
    u→v from level L−1 into level L — the quantity Brandes accumulates
    onto both the edge (edge betweenness) and the predecessor u (node
    betweenness), so both sweeps share this join."""
    return (
        w.hint("shuffle_hash").join(rev, w[ID] == rev["v"])
        .select(
            "s",
            "u",
            "v",
            ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("_r"),
        )
        .join(
            prev.select("s", F.col(ID).alias("u"), F.col("sigma").alias("_sp")),
            ["s", "u"],
        )
        .select("s", "u", "v", (F.col("_sp") * F.col("_r")).alias("_c"))
    )


def _backward_level(w: DataFrame, rev: DataFrame, prev: DataFrame) -> DataFrame:
    """One backward-sweep superstep: push dependencies from level-L nodes
    ``w`` (s, id, sigma, delta) to their BFS-DAG predecessors in ``prev``."""
    return (
        _backward_contribs(w, rev, prev)
        .groupBy("s", F.col("u").alias(ID))
        .agg(F.sum("_c").alias("delta"))
    )


def betweenness_sampled(
    graph: LinkGraph,
    sources: DataFrame | list | int | None = None,
    max_hops: int = 50,
    normalized: bool = True,
    _edges: bool = False,
) -> DataFrame:
    """DataFrame[id, betweenness] — source-sampled Brandes estimator.

    ``sources``: None = all nodes (EXACT betweenness, O(V) BFS sweeps — only
    sane on small graphs; raises if ``max_hops`` truncates the BFS before
    the frontier empties); a list/DataFrame of node ids = those sources
    (deduplicated and restricted to nodes actually in the graph); an int k =
    a deterministic hash-ordered sample of k nodes. With k < n sources the
    per-source dependencies are scaled by n/k (the unbiased Brandes–Pich
    estimator), matching ``networkx.betweenness_centrality(k=k)`` up to its
    random source choice — EXCEPT directed+unnormalized+sampled, where
    networkx's ``_rescale`` skips the n/k factor entirely (scale is None);
    this engine applies n/k there too, keeping the estimator unbiased for
    every flag combination. Distances are hop counts (unweighted shortest
    paths), as in the reference's networkx default; with sampled sources a
    deliberately small ``max_hops`` gives the standard bounded-distance
    estimate.

    Scale shape: the forward phase is a level-synchronous multi-source BFS
    over state rows (source, node, sigma); each level is one join of the
    level frontier against the edge table (hash-partitioned by src once,
    reused every superstep — only the frontier shuffles) plus one algebraic
    groupBy summing path counts. The backward phase replays the levels
    deepest-first: one join per level against the reversed edge table and one
    groupBy summing dependency contributions. State is O(k·V) rows total,
    every aggregate is algebraic (map-side partial), and no window functions
    or driver-side iteration over rows exist anywhere.
    """
    spark = graph.edges.sparkSession
    n = graph.number_of_nodes()
    exact = sources is None
    if isinstance(sources, int):
        src_df = (
            graph.nodes.select(F.col(ID).alias("s"))
            .orderBy(F.xxhash64(F.col("s"), F.lit(13)))
            .limit(sources)
        )
    elif isinstance(sources, list):
        if not sources:
            raise ValueError("sources must be non-empty")
        src_df = spark.createDataFrame([(x,) for x in sources], ["s"])
    elif sources is None:
        src_df = graph.nodes.select(F.col(ID).alias("s"))
    else:
        src_df = sources.select(F.col(sources.columns[0]).alias("s"))
    # duplicate or unknown sources would corrupt both the sigma counts and
    # the n/k estimator scale — canonicalize before the BFS
    src_df = src_df.distinct().join(
        graph.nodes.select(F.col(ID).alias("s")), "s", "left_semi"
    )

    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        # pinned (not checkpointed): keeps each table's hash partitioning
        # visible to Catalyst so the per-level joins exchange only the
        # frontier, never the edge tables
        fwd = pin_partitioned(
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .repartition(npart, "u")
        )
        rev = pin_partitioned(fwd.repartition(npart, "v"))

        # Forward: levels[L] = DataFrame[s, id, sigma] of nodes first reached
        # at hop L, sigma = number of shortest s→id paths (double: path
        # counts grow combinatorially and ANSI mode makes integer overflow
        # throw rather than wrap).
        level0 = src_df.select(
            "s", F.col("s").alias(ID), F.lit(1.0).alias("sigma")
        ).localCheckpoint(eager=True)
        k = level0.count()
        if k == 0:
            raise ValueError("sources must resolve to at least one graph node")
        levels = [level0]
        # `seen` stays a LAZY union over the eagerly-cached level frontiers:
        # re-checkpointing it each level would rewrite all prior levels'
        # rows every superstep (O(levels²·k·V) write amplification); as a
        # union of cached scans the anti-join reads each level once
        seen = level0.select("s", ID)
        truncated = False
        for hop in range(max_hops):
            frontier = levels[-1]
            nxt = _forward_level(frontier, fwd, seen).localCheckpoint(eager=True)
            if nxt.limit(1).count() == 0:
                break
            levels.append(nxt)
            seen = seen.unionByName(nxt.select("s", ID))
        else:
            # range exhausted without the empty-frontier break: probe one
            # more level before claiming truncation (diameter == max_hops is
            # still exact)
            truncated = (
                _forward_level(levels[-1], fwd, seen).limit(1).count() > 0
            )
        if truncated and exact:
            fwd.unpersist()
            rev.unpersist()
            raise RuntimeError(
                f"exact betweenness (sources=None) did not exhaust the BFS "
                f"within max_hops={max_hops}; raise max_hops above the graph "
                "diameter (truncation is only valid for sampled estimates)"
            )

        # Backward: delta(v) = Σ_{w: succ on BFS DAG} sigma_v/sigma_w·(1+delta_w).
        # In unweighted BFS every DAG successor of a level-(L-1) node sits at
        # level L, so each node's dependency is complete after one sweep step.
        parts: list[DataFrame] = []
        edge_parts: list[DataFrame] = []
        delta_cur: DataFrame | None = None  # deltas of levels[L] while at L
        for lvl in range(len(levels) - 1, 0, -1):
            w = levels[lvl]
            if delta_cur is not None:
                w = w.join(delta_cur, ["s", ID], "left").select(
                    "s", ID, "sigma",
                    F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"),
                )
            else:
                w = w.select("s", ID, "sigma", F.lit(0.0).alias("delta"))
            w = w.localCheckpoint(eager=True)
            parts.append(w.select("s", ID, "delta"))
            prev = levels[lvl - 1]
            if _edges:
                contribs = _backward_contribs(w, rev, prev).localCheckpoint(
                    eager=True
                )
                edge_parts.append(
                    contribs.groupBy("u", "v").agg(F.sum("_c").alias("_be"))
                )
                delta_cur = (
                    contribs.groupBy("s", F.col("u").alias(ID))
                    .agg(F.sum("_c").alias("delta"))
                    .localCheckpoint(eager=True)
                )
            else:
                delta_cur = _backward_level(w, rev, prev).localCheckpoint(
                    eager=True
                )

        fwd.unpersist()
        rev.unpersist()
        if _edges:
            t = graph.nodes.schema[ID].dataType.simpleString()
            if edge_parts:
                raw_e = edge_parts[0]
                for p in edge_parts[1:]:
                    raw_e = raw_e.unionByName(p)
                if not graph.is_directed:
                    # accumulate both orientations onto the canonical
                    # unordered edge, as networkx does on its Graph keys
                    raw_e = raw_e.select(
                        F.least("u", "v").alias("u"),
                        F.greatest("u", "v").alias("v"),
                        "_be",
                    )
                eb = raw_e.groupBy("u", "v").agg(F.sum("_be").alias("_b"))
            else:
                eb = spark.createDataFrame([], f"u {t}, v {t}, _b double")
            edge_list = fwd if graph.is_directed else fwd.filter(
                F.col("u") < F.col("v")
            )
            # networkx _rescale_e parity: normalized → 1/(n(n-1)) (None if
            # n ≤ 1); unnormalized undirected → 0.5; sampled → ×(n/k)
            # (applied for every flag combination, keeping the estimator
            # unbiased where networkx's directed+unnormalized path skips it)
            e_scale = None
            if normalized:
                if n > 1:
                    e_scale = 1.0 / (n * (n - 1))
            elif not graph.is_directed:
                e_scale = 0.5
            if k < n:
                e_scale = (1.0 if e_scale is None else e_scale) * (float(n) / k)
            e_val = F.coalesce(F.col("_b"), F.lit(0.0))
            if e_scale is not None:
                e_val = e_val * F.lit(e_scale)
            return (
                edge_list.join(eb, ["u", "v"], "left")
                .select(
                    F.col("u").alias(SRC),
                    F.col("v").alias(DST),
                    e_val.alias("betweenness"),
                )
            )

        if parts:
            raw = parts[0]
            for p in parts[1:]:
                raw = raw.unionByName(p)
            bc = raw.groupBy(ID).agg(F.sum("delta").alias("_b"))
        else:
            t = graph.nodes.schema[ID].dataType.simpleString()
            bc = spark.createDataFrame([], f"{ID} {t}, _b double")

    # networkx _rescale parity: normalized → 1/((n-1)(n-2)) (None if n<=2);
    # unnormalized undirected → 0.5 (raw counts each unordered pair twice);
    # sampled (k<n) → additionally ×(n/k).
    scale = None
    if normalized:
        if n > 2:
            scale = 1.0 / ((n - 1) * (n - 2))
    elif not graph.is_directed:
        scale = 0.5
    if k < n:
        scale = (1.0 if scale is None else scale) * (float(n) / k)
    val = F.coalesce(F.col("_b"), F.lit(0.0))
    if scale is not None:
        val = val * F.lit(scale)
    return (
        graph.nodes.select(ID)
        .join(bc, ID, "left")
        .select(ID, val.alias("betweenness"))
    )


def edge_betweenness_sampled(
    graph: LinkGraph,
    sources: DataFrame | list | int | None = None,
    max_hops: int = 50,
    normalized: bool = True,
) -> DataFrame:
    """DataFrame[src, dst, betweenness] — source-sampled Brandes EDGE
    betweenness, sharing the node estimator's forward/backward supersteps
    (the backward sweep's per-DAG-edge term σ_u·(1+δ_v)/σ_v is exactly
    the quantity Brandes accumulates onto edges, so the edge variant costs
    one extra algebraic aggregate per level, nothing more). ``sources``
    semantics, hop-count distances, and the sampling estimator match
    :func:`betweenness_sampled`; scaling matches
    ``networkx.edge_betweenness_centrality``: normalized → 1/(n(n−1)),
    unnormalized undirected → 0.5, sampled → ×(n/k). Undirected graphs
    report each edge once (src < dst) with both orientations' dependency
    mass accumulated, as networkx does; edges on no shortest path report
    0.0."""
    return betweenness_sampled(
        graph, sources=sources, max_hops=max_hops, normalized=normalized,
        _edges=True,
    )
