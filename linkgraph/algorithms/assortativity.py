"""Degree assortativity coefficient — Pearson correlation of endpoint
degrees over the edge list (Newman, "Assortative mixing in networks", 2002).

NOT present in the reference (no mixing/correlation code under
``mercury/``); added as a one-pass structural summary a graph engine at
100 TB should provide: two algebraic degree aggregates, one join of the
edge list against the (node-sized, broadcastable) degree table per
endpoint, and a single ``corr`` aggregate — no window, no iteration, no
driver-side rows.

Semantics match ``networkx.degree_assortativity_coefficient``:
- undirected: every edge contributes BOTH (deg(u), deg(v)) and
  (deg(v), deg(u)) pairs (the symmetrized edge list the LinkGraph already
  materializes), so the correlation is symmetric by construction;
- directed: pairs are (out_degree(u), in_degree(v)) over the directed
  edges — networkx's default ``x='out', y='in'``.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


def degree_assortativity(graph: LinkGraph) -> float:
    """Pearson degree-degree correlation over edges; NaN on degenerate
    inputs (no edges, or zero degree variance) exactly like networkx.

    Edges are canonicalized first — parallel edges collapsed, self-loops
    dropped — so a weighted multigraph input measures the same simple-graph
    statistic networkx computes on its collapsed Graph/DiGraph (networkx's
    own self-loop handling counts a loop twice in the degree; this engine
    follows its triangle/clustering convention and ignores loops)."""
    edges = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    if graph.is_directed:
        dout = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("dx"))
        din = (
            edges.groupBy(DST).agg(F.count(F.lit(1)).alias("dy"))
        )
        pairs = (
            edges.join(dout, SRC)
            .join(din, DST)
            .select("dx", "dy")
        )
    else:
        # LinkGraph materializes undirected edges as src↔dst both ways, so
        # the degree table and the pair list are already symmetric
        deg = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("d"))
        pairs = (
            edges.join(deg.select(F.col(SRC).alias("_u"), F.col("d").alias("dx")),
                       edges[SRC] == F.col("_u"))
            .join(deg.select(F.col(SRC).alias("_v"), F.col("d").alias("dy")),
                  edges[DST] == F.col("_v"))
            .select("dx", "dy")
        )
    try:
        row = pairs.agg(F.corr("dx", "dy").alias("r")).collect()[0]
    except Exception as e:  # ANSI mode: zero degree variance → DIVIDE_BY_ZERO
        if "DIVIDE_BY_ZERO" in str(e):
            return float("nan")
        raise
    return float("nan") if row["r"] is None else float(row["r"])


def rich_club_coefficient(graph: LinkGraph):
    """Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) for every
    k with N_k ≥ 2, where N_k counts nodes of degree > k and E_k counts
    edges whose BOTH endpoints have degree > k (Zhou & Mondragón 2004) —
    DataFrame [k, n_nodes, n_edges, rc], matching
    ``networkx.rich_club_coefficient(G, normalized=False)``.

    Plan: degree aggregate → per-edge min-endpoint-degree → TWO histograms
    (node-degree, edge-min-degree). All suffix sums and the k-interval
    expansion run over the merged histogram, which has one row per
    DISTINCT degree value (≤ O(√m) under any realistic tail) — the only
    window in the plan orders that metadata-sized table, never the nodes
    or edges. φ is a step function changing only at present degree
    values, so each histogram interval explodes into its constant run of
    k rows; output size is max-degree rows, computed linearly."""
    if graph.is_directed:
        raise ValueError("rich_club_coefficient is undirected-only (as networkx)")
    from pyspark.sql import Window

    edges = (
        graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST)).distinct()
    )
    deg = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("_d"))
    canon = edges.filter(F.col(SRC) < F.col(DST))
    emin = (
        canon.join(deg.select(F.col(SRC), F.col("_d").alias("_ds")), SRC)
        .join(
            deg.select(F.col(SRC).alias(DST), F.col("_d").alias("_dd")), DST
        )
        .select(F.least("_ds", "_dd").alias("_d"))
    )
    nh = deg.groupBy("_d").agg(F.count(F.lit(1)).alias("_nd"))
    eh = emin.groupBy("_d").agg(F.count(F.lit(1)).alias("_ed"))
    hist = (
        nh.join(eh, "_d", "full")
        .select(
            "_d",
            F.coalesce("_nd", F.lit(0)).alias("_nd"),
            F.coalesce("_ed", F.lit(0)).alias("_ed"),
        )
    )
    asc = Window.orderBy(F.asc("_d")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.orderBy(F.asc("_d")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    nxt = Window.orderBy(F.asc("_d"))
    cum = hist.select(
        "_d",
        (F.sum("_nd").over(tot) - F.sum("_nd").over(asc)).alias("_n_gt"),
        (F.sum("_ed").over(tot) - F.sum("_ed").over(asc)).alias("_e_gt"),
        F.lead("_d").over(nxt).alias("_next"),
    )
    # k runs over [boundary, next boundary) — inject the leading [0, first)
    # interval (N_k there = ALL positive-degree nodes = suffix at a
    # sentinel below every real degree)
    first = hist.select(
        F.lit(-1).alias("_d"),
        F.sum("_nd").alias("_n_gt"),
        F.sum("_ed").alias("_e_gt"),
        F.min("_d").alias("_next"),
    )
    lo = F.when(F.col("_d") < 0, F.lit(0)).otherwise(F.col("_d"))
    hi = F.col("_next") - 1  # always present on surviving rows: the max
    # present degree's row has _n_gt = 0 and is filtered out below
    ks = (
        cum.unionByName(first)
        .filter(F.col("_n_gt") >= 2)
        .select(
            F.explode(
                F.when(lo <= hi, F.sequence(lo, hi)).cast("array<int>")
            ).alias("k"),
            F.col("_n_gt").alias("n_nodes"),
            F.col("_e_gt").alias("n_edges"),
        )
    )
    return ks.select(
        "k",
        "n_nodes",
        "n_edges",
        (
            F.lit(2.0)
            * F.col("n_edges").cast("double")
            / (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1))).cast("double")
        ).alias("rc"),
    )


def attribute_assortativity(
    graph: LinkGraph,
    attrs,
    id_col: str = "id",
    attr_col: str = "attr",
) -> float:
    """Newman's attribute (categorical) assortativity coefficient —
    ``networkx.attribute_assortativity_coefficient`` parity: with the
    edge-endpoint category mixing matrix e, r = (Σᵢeᵢᵢ − Σᵢaᵢbᵢ) /
    (1 − Σᵢaᵢbᵢ); r = 1 iff every edge joins like with like, 0 at random
    mixing, negative when categories repel. Undirected graphs count both
    orientations (the symmetric edge table maps 1:1 onto networkx's
    symmetrized mixing dict); edges touching a node with no attribute row
    are excluded (inner-join semantics); self-loops count like networkx's
    (u, u) edges. NaN on degenerate inputs (no attributed edges, or a
    single category — Σab = 1).

    Plan: two broadcastable attribute joins + ONE algebraic (ca, cb)
    count aggregate; the mixing matrix (|categories|² rows — metadata)
    is collected and the scalar formula runs driver-side, the same
    budget class as degree_assortativity's corr scalar."""
    lab = attrs.select(F.col(id_col).alias(ID), F.col(attr_col).alias("_c"))
    edges = graph.edges.select(SRC, DST).distinct()
    mix = (
        edges.join(lab.select(F.col(ID).alias(SRC), F.col("_c").alias("_ca")), SRC)
        .join(lab.select(F.col(ID).alias(DST), F.col("_c").alias("_cb")), DST)
        .groupBy("_ca", "_cb")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    total = float(sum(r["_n"] for r in mix))
    if total == 0:
        return float("nan")
    cats = sorted({r["_ca"] for r in mix} | {r["_cb"] for r in mix})
    e = {(r["_ca"], r["_cb"]): r["_n"] / total for r in mix}
    tr = sum(e.get((c, c), 0.0) for c in cats)
    a = {c: sum(e.get((c, d), 0.0) for d in cats) for c in cats}
    b = {c: sum(e.get((d, c), 0.0) for d in cats) for c in cats}
    sab = sum(a[c] * b[c] for c in cats)
    if sab == 1.0:
        return float("nan")
    return (tr - sab) / (1.0 - sab)


def numeric_assortativity(
    graph: LinkGraph,
    attrs,
    id_col: str = "id",
    attr_col: str = "attr",
) -> float:
    """Pearson correlation of endpoint NUMERIC attribute values over the
    edge list — ``networkx.numeric_assortativity_coefficient`` parity
    (their mixing-matrix Pearson reduces to the plain edge-pair
    correlation). Same conventions as :func:`attribute_assortativity`:
    undirected graphs count both orientations, unattributed endpoints
    drop the edge (inner join), self-loops count. NaN on degenerates
    (no attributed edges, zero variance on either side).

    Plan: two broadcastable attribute joins + ONE ``corr`` aggregate —
    the degree_assortativity shape with values swapped for degrees."""
    lab = attrs.select(
        F.col(id_col).alias(ID), F.col(attr_col).cast("double").alias("_x")
    )
    edges = graph.edges.select(SRC, DST).distinct()
    # ANSI mode: corr() raises divide-by-zero on zero variance, so take
    # the Pearson pieces from one aggregate and divide driver-side
    row = (
        edges.join(lab.select(F.col(ID).alias(SRC), F.col("_x").alias("_xa")), SRC)
        .join(lab.select(F.col(ID).alias(DST), F.col("_x").alias("_xb")), DST)
        .agg(
            F.covar_pop("_xa", "_xb").alias("_cov"),
            F.stddev_pop("_xa").alias("_sa"),
            F.stddev_pop("_xb").alias("_sb"),
        )
        .collect()[0]
    )
    if row["_cov"] is None or not row["_sa"] or not row["_sb"]:
        return float("nan")
    return float(row["_cov"]) / (float(row["_sa"]) * float(row["_sb"]))


def average_neighbor_degree(graph: LinkGraph):
    """Per-node average degree of neighbors — DataFrame [id, avg_nbr_deg],
    ``networkx.average_neighbor_degree`` parity on undirected simple
    graphs (parallel edges collapsed, self-loops dropped; isolated nodes
    are absent from the edge list and therefore from the result, matching
    networkx's 0-free dict only up to nodes that HAVE neighbors — callers
    wanting zeros left-join against graph.nodes).

    Plan: one degree aggregate, one broadcast-sized join of the symmetric
    edge list against it, one avg aggregate — no window, no iteration.
    """
    if graph.is_directed:
        raise ValueError("average_neighbor_degree is undirected-only here")
    edges = (
        graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST)).distinct()
    )
    deg = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("_d"))
    return (
        edges.join(
            deg.select(F.col(SRC).alias(DST), F.col("_d").alias("_dn")), DST
        )
        .groupBy(SRC)
        .agg(F.avg("_dn").alias("avg_nbr_deg"))
        .select(F.col(SRC).alias(ID), "avg_nbr_deg")
    )


def average_degree_connectivity(graph: LinkGraph):
    """Degree-correlation function knn(k) (Barrat et al. 2004) —
    DataFrame [degree, knn]: for each present degree k, the mean degree
    of neighbors over all edge endpoints whose node has degree k.
    ``networkx.average_degree_connectivity`` parity: because every node
    in the class has the same degree k, averaging per-node means equals
    averaging over incident (v,u) pairs, which is the single aggregate
    computed here. Output is histogram-sized (one row per distinct
    degree, ≤ O(√m) under any realistic tail)."""
    if graph.is_directed:
        raise ValueError("average_degree_connectivity is undirected-only here")
    edges = (
        graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST)).distinct()
    )
    deg = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("_d"))
    return (
        edges.join(deg.select(SRC, F.col("_d").alias("_dv")), SRC)
        .join(deg.select(F.col(SRC).alias(DST), F.col("_d").alias("_dn")), DST)
        .groupBy(F.col("_dv").alias("degree"))
        .agg(F.avg("_dn").alias("knn"))
    )


def s_metric(graph: LinkGraph) -> float:
    """s-metric Σ_{(u,v)∈E} deg(u)·deg(v) (Li, Alderson, Doyle & Willinger
    2005), each undirected edge counted once — ``networkx.s_metric(G)``
    parity on the collapsed simple graph. A scalar companion to
    [[degree_assortativity]]: the same edge×degree join feeding a sum
    instead of a correlation."""
    if graph.is_directed:
        raise ValueError("s_metric is undirected-only (as networkx)")
    edges = (
        graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST)).distinct()
    )
    deg = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("_d"))
    canon = edges.filter(F.col(SRC) < F.col(DST))
    row = (
        canon.join(deg.select(SRC, F.col("_d").alias("_ds")), SRC)
        .join(deg.select(F.col(SRC).alias(DST), F.col("_d").alias("_dd")), DST)
        .agg(F.sum(F.col("_ds").cast("double") * F.col("_dd")).alias("s"))
        .collect()[0]
    )
    return 0.0 if row["s"] is None else float(row["s"])


def powerlaw_alpha(graph: LinkGraph, xmin: int = 1, degree: str = "total"):
    """Continuous-approximation MLE of the power-law degree exponent
    (Clauset, Shalizi & Newman, SIAM Rev. 2009, eq. 3.7 / Hill 1975):

        alpha = 1 + n / SUM_{d_i >= xmin} ln(d_i / (xmin - 1/2))

    over the tail of the degree distribution at the caller-chosen ``xmin``
    (this engine does not do the KS-minimizing xmin scan — that is a
    driver-side model-selection loop over this same aggregate, documented
    non-goal). Returns ``(alpha, sigma, n_tail)`` with
    sigma = (alpha - 1)/sqrt(n_tail), the CSN standard error.

    ``degree`` picks which count feeds the fit: "total" (default), "in",
    or "out" — multigraph degrees over the stored edge list, matching
    ``LinkGraph.degree``'s convention (closing the loop with
    :func:`linkgraph.generators.zipf_graph`, whose rank profile at s=1
    yields alpha ≈ 2).

    Scale shape: one degree aggregation (the shuffle every degree query
    already pays) + one algebraic (count, sum-of-logs) aggregate — no
    window, no iteration, no driver-side rows. (alpha, n_tail) is NaN/0 on
    an empty tail, as scipy would be."""
    if xmin < 1:
        raise ValueError(f"need xmin >= 1, got {xmin}")
    e = graph.edges
    if degree == "total":
        ends = e.select(F.col(SRC).alias(ID)).unionAll(
            e.select(F.col(DST).alias(ID))
        )
    elif degree == "out":
        ends = e.select(F.col(SRC).alias(ID))
    elif degree == "in":
        ends = e.select(F.col(DST).alias(ID))
    else:
        raise ValueError(f"degree must be total|in|out, got {degree!r}")
    deg = ends.groupBy(ID).agg(F.count(F.lit(1)).alias("_d"))
    row = (
        deg.filter(F.col("_d") >= xmin)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.log(F.col("_d") / F.lit(xmin - 0.5))).alias("slog"),
        )
        .collect()[0]
    )
    n = int(row["n"])
    if n == 0 or row["slog"] is None or row["slog"] <= 0.0:
        return float("nan"), float("nan"), n
    alpha = 1.0 + n / float(row["slog"])
    return alpha, (alpha - 1.0) / math.sqrt(n), n


def normalized_rich_club(
    graph: LinkGraph, rounds: int = 4, seed: int = 42
) -> DataFrame:
    """DataFrame[k, rc, rc_null, rc_norm] — rich-club coefficient
    normalized by a degree-preserving rewired null (Colizza et al.,
    Nature Physics'06): raw φ(k) rises mechanically with degree even in
    random graphs, so the signal is φ(k)/φ_null(k) > 1 against a
    configuration-model null with the IDENTICAL degree sequence.

    The null is :func:`linkgraph.algorithms.rewire.rewire_edges` applied
    to the canonical undirected edge set (the parallel double-edge-swap
    round preserves undirected degrees unconditionally; duplicate arcs
    produced by the multiset relaxation collapse in rich_club's distinct
    — a small, deterministic edge-loss bias stated here rather than
    hidden). Deterministic: same graph + seed ⇒ same curve. Inner join on
    k; k rows where the null club has no internal edges (rc_null = 0)
    are dropped (networkx raises there instead)."""
    from linkgraph.algorithms.rewire import rewire_edges

    if graph.is_directed:
        raise ValueError("normalized_rich_club is undirected-only")
    und = (
        graph.edges.select(
            F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST)
        )
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    null_edges = rewire_edges(
        LinkGraph(und, keys={"directed": True}), rounds=rounds, seed=seed
    )
    obs = rich_club_coefficient(graph).select("k", "rc")
    null = rich_club_coefficient(
        LinkGraph(null_edges, keys={"directed": False})
    ).select(F.col("k"), F.col("rc").alias("rc_null"))
    return (
        obs.join(null, "k")
        .filter(F.col("rc_null") > 0)
        .select(
            "k", "rc", "rc_null",
            (F.col("rc") / F.col("rc_null")).alias("rc_norm"),
        )
    )
