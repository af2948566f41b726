"""Triangle counting — degree-ordered edge orientation + join intersection.

NOT present in the reference (no triangle code under ``mercury/``); required
by the north rule (BASELINE.json:6). Classic MapReduce scheme (Suri &
Vassilvitskii; cf. HERO, SIGMOD'24 in PAPERS.md): orient each undirected edge
from the lower-(degree, id) endpoint to the higher one — every triangle then
has exactly one "pivot" node with two out-edges, and is counted exactly once
by joining the oriented edge list with itself and probing the closing edge.

Scale notes: orientation bounds out-degree by O(sqrt(m)) on any graph, so the
wedge join (e1.dst = e2.src... actually pivot self-join on src) never
explodes on hubs — hubs become high-IN-degree, which the closing-edge hash
join handles; AQE skew-join splits the hot partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, WEIGHT, LinkGraph


def _canonical_undirected(graph: LinkGraph) -> DataFrame:
    """Distinct undirected simple edges as (a, b) with a < b, loops dropped."""
    return (
        graph.edges.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _degrees_of(und: DataFrame) -> DataFrame:
    """(id, deg) over a canonical undirected edge set."""
    return (
        und.select(F.col("a").alias(ID))
        .union(und.select(F.col("b").alias(ID)))
        .groupBy(ID)
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _orient(und: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """Orient a canonical undirected edge set low→high by (degree, id).
    Pass a precomputed ``deg`` to avoid a second degree shuffle."""
    if deg is None:
        deg = _degrees_of(und)
    e = (
        und.join(deg.select(F.col(ID).alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col(ID).alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    return e


def _triples_of(e: DataFrame) -> DataFrame:
    """Triangles (x, y, z) with y < z from a persisted oriented edge set."""
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    # wedge (x; y, z) has y < z by id; probe the undirected edge set in the
    # same canonical order. Orientation is a bijection on the distinct edge
    # set, so `closing` is distinct by construction.
    closing = e.select(F.least("u", "v").alias("y"), F.greatest("u", "v").alias("z"))
    return wedges.join(closing.hint("shuffle_hash"), ["y", "z"], "leftsemi")


def _triangle_triples(graph: LinkGraph):
    """All triangles as (x, y, z) node triples, each exactly once."""
    e = _orient(_canonical_undirected(graph)).persist()
    e.count()
    return _triples_of(e), e


def triangle_count(graph: LinkGraph) -> int:
    """Global triangle count (exact)."""
    tri, e = _triangle_triples(graph)
    n = tri.count()
    e.unpersist()
    return n


def triangle_counts_per_vertex(graph: LinkGraph) -> DataFrame:
    """Per-vertex triangle participation counts, zero-filled over all nodes
    (matches networkx ``triangles``)."""
    tri, e = _triangle_triples(graph)
    corners = (
        tri.select(F.col("x").alias(ID))
        .union(tri.select(F.col("y").alias(ID)))
        .union(tri.select(F.col("z").alias(ID)))
    )
    counts = corners.groupBy(ID).agg(F.count(F.lit(1)).alias("triangles"))
    out = (
        graph.nodes.select(ID)
        .join(counts, ID, "left")
        .select(ID, F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def local_clustering_coefficient(graph: LinkGraph) -> DataFrame:
    """DataFrame[id, lcc] — networkx ``clustering()`` parity on the
    underlying undirected simple graph: lcc(v) = 2·T(v) / (d(v)·(d(v)−1))
    with d the distinct-neighbor degree (self-loops dropped), 0.0 when
    d < 2.

    Shares the degree-oriented triangle pipeline: one extra algebraic degree
    aggregate over the already-persisted oriented edge set (orientation is a
    bijection on the distinct undirected edges, so appearances in u ∪ v ARE
    the simple degree) plus one zero-filled join — no new shuffle shape
    beyond ``triangle_counts_per_vertex``."""
    tri, e = _triangle_triples(graph)
    corners = (
        tri.select(F.col("x").alias(ID))
        .union(tri.select(F.col("y").alias(ID)))
        .union(tri.select(F.col("z").alias(ID)))
    )
    counts = corners.groupBy(ID).agg(F.count(F.lit(1)).alias("t"))
    deg = (
        e.select(F.col("u").alias(ID))
        .union(e.select(F.col("v").alias(ID)))
        .groupBy(ID)
        .agg(F.count(F.lit(1)).alias("d"))
    )
    out = (
        graph.nodes.select(ID)
        .join(deg, ID, "left")
        .join(counts, ID, "left")
        .select(
            ID,
            F.when(
                F.coalesce(F.col("d"), F.lit(0)) >= 2,
                2.0 * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def effective_size(graph: LinkGraph) -> DataFrame:
    """DataFrame[id, effective_size] — Burt's effective size of each ego
    network on the unweighted undirected simple graph (networkx
    ``effective_size`` parity via the Borgatti simplification):

        ES(u) = d(u) − 2·T(u) / d(u)

    with d the distinct-neighbor degree and T(u) the triangles through u
    (each triangle at u is one tie among u's alters — redundancy). The
    structural-holes primitive: on a collaboration/import graph it ranks
    brokers whose contacts are NOT otherwise connected.

    Deviation (documented, same convention as closeness): isolated nodes
    get 0.0 where networkx emits NaN — a NaN column poisons downstream
    aggregates. Shares the degree-oriented triangle pipeline — one extra
    algebraic degree aggregate, no new shuffle shape."""
    tri, e = _triangle_triples(graph)
    corners = (
        tri.select(F.col("x").alias(ID))
        .union(tri.select(F.col("y").alias(ID)))
        .union(tri.select(F.col("z").alias(ID)))
    )
    counts = corners.groupBy(ID).agg(F.count(F.lit(1)).alias("t"))
    deg = (
        e.select(F.col("u").alias(ID))
        .union(e.select(F.col("v").alias(ID)))
        .groupBy(ID)
        .agg(F.count(F.lit(1)).alias("d"))
    )
    out = (
        graph.nodes.select(ID)
        .join(deg, ID, "left")
        .join(counts, ID, "left")
        .select(
            ID,
            F.when(
                F.coalesce(F.col("d"), F.lit(0)) >= 1,
                F.col("d")
                - 2.0 * F.coalesce(F.col("t"), F.lit(0)) / F.col("d"),
            )
            .otherwise(F.lit(0.0))
            .alias("effective_size"),
        )
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def average_clustering(graph: LinkGraph) -> float:
    """networkx ``average_clustering()`` parity: mean lcc over ALL nodes."""
    lcc = local_clustering_coefficient(graph)
    row = lcc.agg(F.avg("lcc").alias("a")).collect()[0]
    return float(row["a"] or 0.0)


def transitivity(graph: LinkGraph) -> float:
    """Global clustering coefficient: 3·triangles / wedges, with wedges =
    Σ_v deg(v)·(deg(v)−1)/2 over the canonical simple undirected graph
    (0.0 for wedge-free graphs). Shares the degree-oriented triangle
    pipeline; the wedge term is one extra algebraic degree aggregate —
    no new joins. Matches ``nx.transitivity``."""
    und = _canonical_undirected(graph).persist()
    deg = None
    try:
        deg = _degrees_of(und).persist()
        tri = _triples_of(_orient(und, deg)).count()
        # decimal(38,0) accumulator: sum(d*(d-1)) over long overflows 2^63
        # (ANSI throws) already at one ~3e9-degree hub
        wedges = int(
            deg.agg(
                F.sum(
                    F.col("deg").cast("decimal(38,0)") * (F.col("deg") - 1)
                ).alias("w")
            ).collect()[0][0]
            or 0
        ) // 2
    finally:
        if deg is not None:
            deg.unpersist()
        und.unpersist()
    return (3.0 * tri / float(wedges)) if wedges else 0.0


def square_count(graph: LinkGraph, max_neighbor_degree: int | None = None) -> int:
    """Number of 4-cycles: every C4 has two opposite (non-edge-constrained)
    pairs, each seeing the cycle's other two nodes as common neighbors, so

        squares = (1/2) · Σ over unordered pairs C(cn(u,v), 2)

    computed from one wedge self-join + one algebraic groupBy (the
    link-prediction enumeration shape); ``max_neighbor_degree`` prunes
    hub wedges exactly as in :func:`linkgraph.algorithms.linkpred.
    link_prediction_scores` (then the count is a lower bound — documented
    hub-cap trade, exact when unset)."""
    und = _canonical_undirected(graph)
    # adj: (neighbor n, center c) — wedge join on the shared center;
    # persisted: it feeds both join sides (and the cap aggregate), which
    # would otherwise each recompute the distinct canonicalization
    adj = und.select(F.col("a").alias("n"), F.col("b").alias("c")).unionByName(
        und.select(F.col("b").alias("n"), F.col("a").alias("c"))
    )
    if max_neighbor_degree is not None:
        adj = adj.persist()
        cdeg = adj.groupBy("c").agg(F.count(F.lit(1)).alias("_cd"))
        capped = adj.join(
            cdeg.filter(F.col("_cd") <= max_neighbor_degree).select("c"), "c"
        ).persist()
        adj.unpersist()
        adj = capped
    else:
        adj = adj.persist()
    try:
        left = adj.select(F.col("n").alias("u"), "c")
        right = adj.select(F.col("n").alias("v"), "c")
        cn = (
            left.join(right, "c")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("cn"))
            .filter(F.col("cn") >= 2)
        )
        # integer-exact: sum cn*(cn-1) = 2*sum C(cn,2); squares = that / 4;
        # decimal accumulator avoids the ANSI int64 overflow at hub scale
        total = cn.agg(
            F.sum(F.col("cn").cast("decimal(38,0)") * (F.col("cn") - 1)).alias("s")
        ).collect()[0][0]
    finally:
        adj.unpersist()
    return int(total or 0) // 4


def clique4_count(graph: LinkGraph) -> int:
    """Number of 4-cliques (K4 subgraphs), exact, each counted once.

    kClist-style listing (Danisch et al., WWW'18; cf. Chiba–Nishizeki) on
    the degree-ordered orientation DAG: under the total order ≺ = (degree,
    id), every K4 {w1 ≺ w2 ≺ w3 ≺ w4} appears exactly once as a fully
    oriented triangle (w1, w2, w3) extended by w3's out-neighbor w4 that is
    also an out-neighbor of w1 and w2.

    Scale notes: orientation bounds out-degree by O(sqrt(m)) — the same
    guarantee that keeps the triangle wedge join hub-safe bounds the
    extension join here; the two membership probes are leftsemi hash joins
    against the oriented edge set (no row blow-up past the candidate list).
    NOT in the reference (no clique code under ``mercury/``)."""
    e = _orient(_canonical_undirected(graph)).persist()
    e.count()
    try:
        # wedges (x; y, z): y,z both out-neighbors of the pivot x, y < z by
        # id only to enumerate each unordered pair once
        wedges = (
            e.alias("e1")
            .join(e.alias("e2"), F.col("e1.u") == F.col("e2.u"))
            .filter(F.col("e1.v") < F.col("e2.v"))
            .select(
                F.col("e1.u").alias("x"),
                F.col("e1.v").alias("y"),
                F.col("e2.v").alias("z"),
            )
        )
        # closing edge carries its true orientation (b ≺ c), keyed by the
        # id-canonical pair so the probe is ONE hash join
        closing = e.select(
            F.least("u", "v").alias("y"),
            F.greatest("u", "v").alias("z"),
            F.col("u").alias("b"),
            F.col("v").alias("c"),
        )
        # fully ordered triangles a ≺ b ≺ c (a = pivot: two out-edges)
        tri = wedges.join(closing.hint("shuffle_hash"), ["y", "z"]).select(
            F.col("x").alias("a"), "b", "c"
        )
        # extend by c's out-neighbors, then require a→d and b→d
        cand = tri.join(
            e.select(F.col("u").alias("c"), F.col("v").alias("d")), "c"
        )
        probe = e.select(F.col("u").alias("p"), F.col("v").alias("d"))
        k4 = cand.join(
            probe.withColumnRenamed("p", "a").hint("shuffle_hash"),
            ["a", "d"],
            "leftsemi",
        ).join(
            probe.withColumnRenamed("p", "b").hint("shuffle_hash"),
            ["b", "d"],
            "leftsemi",
        )
        n = k4.count()
    finally:
        e.unpersist()
    return n


def approx_triangle_count(
    graph: LinkGraph, p: float = 0.1, seed: int = 42
) -> tuple[int, float]:
    """DOULION (Tsourakakis et al., KDD'09) approximate triangle count:
    sparsify to a deterministic p-fraction of the canonical undirected
    edges, count triangles exactly on the sample, scale by 1/p³. Returns
    ``(sampled_triangles, estimate)``; unbiased with variance that vanishes
    as the true count grows.

    The coin is md5(u|v|seed)'s leading 24 bits compared against
    floor(p·2²⁴) — a pure function of the edge, so runs are reproducible
    across partitionings, retries, AND engines (an external SQL engine
    replays the identical sample). At 100 TB this is the triangle path when
    the exact wedge join is too big: the sample shrinks the wedge join by
    p² before any shuffle."""
    if not (0.0 < p <= 1.0):
        raise ValueError(f"sampling probability p must be in (0, 1], got {p}")
    threshold = int(p * (1 << 24))
    und = _canonical_undirected(graph)
    sampled = und.filter(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", "a", "b", F.lit(str(seed)))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        < F.lit(threshold)
    )
    e = _orient(sampled).persist()
    e.count()
    try:
        n = _triples_of(e).count()
    finally:
        e.unpersist()
    return n, n / (p**3)


def _k_clique_plan(e: DataFrame, k: int) -> DataFrame:
    """Lazy plan listing every k-clique of the oriented DAG ``e`` exactly
    once as (w1..wk), members in DAG (degree, id) order. Shared by
    :func:`k_clique_count` (counts it) and :func:`k_cliques` (materializes
    it) — the caller owns ``e``'s persist scope."""
    cliques = e.select(F.col("u").alias("w1"), F.col("v").alias("w2"))
    for i in range(3, k + 1):
        last, new = f"w{i - 1}", f"w{i}"
        cand = cliques.join(
            e.select(F.col("u").alias(last), F.col("v").alias(new)).hint(
                "shuffle_hash"
            ),
            last,
        )
        for j in range(1, i - 1):
            probe = e.select(F.col("u").alias(f"w{j}"), F.col("v").alias(new))
            cand = cand.join(
                probe.hint("shuffle_hash"), [f"w{j}", new], "leftsemi"
            )
        cliques = cand.select(*[f"w{j}" for j in range(1, i + 1)])
    return cliques


def k_clique_count(graph: LinkGraph, k: int) -> int:
    """Exact number of k-cliques (K_k subgraphs), each counted once —
    the arbitrary-k generalization of :func:`clique4_count`.

    kClist (Danisch et al., WWW'18; cf. Chiba–Nishizeki) on the
    degree-ordered orientation DAG: under the total order ≺ = (degree, id)
    every K_k appears exactly once with its members sorted by ≺, so the
    listing extends fully-oriented (i-1)-cliques by the LAST member's
    out-neighbors (any new member must be ≻ all current ones) and keeps a
    candidate only if every earlier member also points to it — i-2 leftsemi
    hash probes against the oriented edge set, no row blow-up past the
    candidate list. Orientation bounds out-degree by O(sqrt(m)), so each
    extension join fans out at most sqrt(m) per clique on any graph; the
    intermediate i-clique volume is the output-sensitive cost inherent to
    exact clique listing.

    NOT in the reference (no clique code under ``mercury/``)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k == 1:
        return graph.number_of_nodes()
    e = _orient(_canonical_undirected(graph)).persist()
    e.count()
    try:
        n = _k_clique_plan(e, k).count()
    finally:
        e.unpersist()
    return int(n)


def k_cliques(graph: LinkGraph, k: int) -> DataFrame:
    """DataFrame[w1..wk] listing every k-clique exactly once, members
    sorted by node id within each row (rows carry no inherent order).
    Same plan as :func:`k_clique_count`; see there for the kClist shape
    and scale notes. Materialized (localCheckpoint) before the shared
    oriented-edge cache is released — the repo-wide persist-scope pattern
    (cf. linkpred.link_prediction_scores)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k == 1:
        return graph.nodes.select(F.col(ID).alias("w1"))
    e = _orient(_canonical_undirected(graph)).persist()
    e.count()
    try:
        cols = [f"w{j}" for j in range(1, k + 1)]
        arr = F.array_sort(F.array(*cols))
        out = (
            _k_clique_plan(e, k)
            .select(*[arr[j].alias(cols[j]) for j in range(k)])
            .localCheckpoint(eager=True)
        )
    finally:
        e.unpersist()
    return out


def weighted_clustering_coefficient(graph: LinkGraph) -> DataFrame:
    """DataFrame[id, wcc] — Onnela et al. (PRE'05) weighted clustering,
    networkx ``clustering(G, weight=...)`` parity:

        wcc(u) = (2 / (d(u)(d(u)−1))) · Σ_{triangles (u,v,w)}
                 (ŵ_uv · ŵ_uw · ŵ_vw)^(1/3)

    with ŵ = w / max(w) over the whole graph and d the distinct-neighbor
    degree; 0.0 when d < 2. Parallel/reverse duplicate edges collapse to
    their MAX weight (documented canonicalization — networkx parity holds
    on simple graphs, which is what its Graph type stores anyway).

    Same degree-ordered-orientation pipeline as :func:`triangle_count`,
    with the three edge weights riding the wedge and closing joins (the
    geometric-mean term is symmetric, so ONE value per triangle is
    credited to all three corners — no per-corner recomputation); the max
    weight is one scalar aggregate. NOT in the reference (its clustering
    surface is unweighted)."""
    if not graph.is_weighted:
        raise ValueError("weighted_clustering_coefficient needs a weight column")
    wund = (
        graph.edges.select(
            F.least(SRC, DST).alias("a"),
            F.greatest(SRC, DST).alias("b"),
            F.col(WEIGHT).cast("double").alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.max("w").alias("w"))
        .persist()
    )
    try:
        wmax = wund.agg(F.max("w")).collect()[0][0]
        if not wmax:
            raise ValueError("weighted clustering needs a positive max weight")
        deg = _degrees_of(wund).persist()
        e = (
            _orient(wund.select("a", "b"), deg)
            .join(
                wund.select(
                    F.least("a", "b").alias("cu"),
                    F.greatest("a", "b").alias("cv"),
                    (F.col("w") / F.lit(float(wmax))).alias("wn"),
                ),
                (F.least("u", "v") == F.col("cu"))
                & (F.greatest("u", "v") == F.col("cv")),
            )
            .select("u", "v", "wn")
            .persist()
        )
        e.count()
        wedges = (
            e.alias("e1")
            .join(e.alias("e2"), F.col("e1.u") == F.col("e2.u"))
            .filter(F.col("e1.v") < F.col("e2.v"))
            .select(
                F.col("e1.u").alias("x"),
                F.col("e1.v").alias("y"),
                F.col("e2.v").alias("z"),
                (F.col("e1.wn") * F.col("e2.wn")).alias("w12"),
            )
        )
        closing = e.select(
            F.least("u", "v").alias("y"), F.greatest("u", "v").alias("z"),
            F.col("wn").alias("w3"),
        )
        tri = wedges.join(closing.hint("shuffle_hash"), ["y", "z"]).select(
            "x", "y", "z",
            F.pow(F.col("w12") * F.col("w3"), F.lit(1.0 / 3.0)).alias("g"),
        )
        credit = (
            tri.select(F.col("x").alias(ID), "g")
            .unionByName(tri.select(F.col("y").alias(ID), "g"))
            .unionByName(tri.select(F.col("z").alias(ID), "g"))
            .groupBy(ID)
            .agg(F.sum("g").alias("gs"))
        )
        out = (
            graph.nodes.select(ID)
            .join(deg, ID, "left")
            .join(credit, ID, "left")
            .select(
                ID,
                F.when(
                    F.coalesce(F.col("deg"), F.lit(0)) >= 2,
                    2.0 * F.coalesce(F.col("gs"), F.lit(0.0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                )
                .otherwise(F.lit(0.0))
                .alias("wcc"),
            )
        )
        out = out.localCheckpoint(eager=True)
        e.unpersist()
        deg.unpersist()
    finally:
        wund.unpersist()
    return out
