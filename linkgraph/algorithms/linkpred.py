"""Link prediction scores — common neighbors, Jaccard, Adamic–Adar,
resource allocation, preferential attachment.

NOT present in the reference (no link-prediction code under ``mercury/``);
added as part of the beyond-reference link-graph surface: "which repos/files
will become connected next" is the canonical downstream question over the
same repo↔path↔import edge table the north rule prescribes.

All three scores are functions of the common-neighbor multiset of a node
pair, so they share one dataflow: treat the graph as undirected, self-join
the edge list on the shared neighbor ``w`` to enumerate wedges
``u - w - v`` (u < v), then ONE algebraic groupBy((u, v)) producing

    common   = count(w)
    adamic   = sum(1 / ln(deg(w)))
    jaccard  = common / (deg(u) + deg(v) - common)   (degrees joined on)

Candidate pairs are exactly the 2-hop pairs (anything with 0 common
neighbors scores 0 in all three measures and is never materialized).
Optionally pairs that are already edges are removed (``exclude_edges`` —
the usual link-prediction setting).

Scale notes (100 TB): the wedge self-join fans out quadratically in the
degree of the shared neighbor — a degree-D hub w contributes D(D-1)/2
pairs, and unlike triangle counting there is no orientation trick that
bounds it, because those pairs genuinely exist. The standard and
principled cut is ``max_neighbor_degree``: wedges through super-hubs carry
almost no signal (Adamic–Adar weights them 1/ln D → 0; a node connected to
everything predicts nothing), so hubs above the threshold are dropped from
the WEDGE role only (their own scores as endpoints are still computed).
The filter is applied to the neighbor table BEFORE the self-join, so the
blow-up never materializes; the same cap appears in the DuckDB oracle, so
the driver hash-checks the capped semantics end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


def _undirected_edges(graph: LinkGraph) -> DataFrame:
    """Distinct undirected edges as (a, b) with a < b, self-loops dropped."""
    return (
        graph.edges.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def link_prediction_scores(
    graph: LinkGraph,
    max_neighbor_degree: int | None = None,
    exclude_edges: bool = True,
    min_common: int = 1,
) -> DataFrame:
    """Score all 2-hop node pairs: (u, v, common, jaccard, adamic_adar).

    ``u < v`` lexicographically; ``jaccard`` uses full undirected degrees
    even when ``max_neighbor_degree`` drops hub wedges (degrees are a
    property of the node, the cap only prunes the wedge enumeration).
    ``min_common`` keeps pairs with at least that many (surviving) common
    neighbors — at scale, raise it to cut the long tail of weak candidates
    before the shuffle writes them.
    """
    out, cached = _scores_lazy(
        graph, max_neighbor_degree, exclude_edges, min_common
    )
    # materialize before releasing the shared caches
    # (repo-wide pattern, cf. triangles.triangle_counts_per_vertex)
    out = out.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def link_prediction_top_k(
    graph: LinkGraph,
    k: int = 10,
    score: str = "adamic_adar",
    max_neighbor_degree: int | None = None,
    exclude_edges: bool = True,
    min_common: int = 1,
) -> DataFrame:
    """Per-node top-k link-prediction candidates:
    (node, candidate, rank, common, jaccard, adamic_adar,
    resource_alloc, pref_attach).

    Every scored pair contributes to BOTH endpoints' lists; ranking is
    (``score`` desc, candidate asc) — fully deterministic, ties broken by
    candidate id. ``score`` ∈ {common, jaccard, adamic_adar, resource_alloc, pref_attach}.

    Scale note: the per-node top-k is a ``row_number`` window, the one shape
    this engine otherwise avoids — here it is the right physical plan:
    Spark 4 rewrites ``rank <= k`` filters into ``WindowGroupLimit`` with a
    Partial mode BEFORE the exchange, so each map task forwards at most k
    rows per node and a 10M-candidate hub never concentrates in one task
    (measured on a degree-4M star: window top-1 ties the algebraic
    ``min(struct)`` form, BENCH/lpa_top1_ab.md — and unlike LPA's top-1,
    top-k-with-rank has no algebraic equivalent)."""
    if score not in (
        "common", "jaccard", "adamic_adar", "resource_alloc", "pref_attach"
    ):
        raise ValueError(
            f"unknown score {score!r} "
            "(common|jaccard|adamic_adar|resource_alloc|pref_attach)"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    out, cached = _scores_lazy(
        graph, max_neighbor_degree, exclude_edges, min_common
    )
    cols = ["common", "jaccard", "adamic_adar", "resource_alloc", "pref_attach"]
    sym = out.select(
        F.col("u").alias("node"), F.col("v").alias("candidate"), *cols
    ).unionAll(
        out.select(F.col("v").alias("node"), F.col("u").alias("candidate"), *cols)
    )
    w = Window.partitionBy("node").orderBy(F.desc(score), F.asc("candidate"))
    top = (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select("node", "candidate", "rank", *cols)
    )
    top = top.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return top


def _scores_lazy(
    graph: LinkGraph,
    max_neighbor_degree: int | None,
    exclude_edges: bool,
    min_common: int,
):
    """Lazy scores plan + the persisted DataFrames it reuses (returned so
    the caller releases them after materializing; split out so tests can
    audit the plan before lineage truncation).

    Cache discipline (plan-audited): without persists the degree aggregate
    recomputes FOUR times (both wedge-join sides + du + dv) and the capped
    wedge table twice — each a full exchange over the edge table. ``deg``
    and ``by_w`` are persisted so every reuse is a cache scan; the big
    shuffle left is the single groupBy((u, v)) over the wedge join."""
    und = _undirected_edges(graph).persist()
    # symmetric neighbor table: one row (node, nbr) per direction
    nbrs = und.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionAll(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
    deg = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("deg")).persist()

    # wedge-role neighbors: each row says "w is adjacent to node"; cap w's
    # degree here so a hub never enters the self-join fan-out
    by_w = nbrs.select(F.col("nbr").alias("w"), F.col("node"))
    wdeg = deg.select(F.col("node").alias("w"), F.col("deg").alias("wdeg"))
    by_w = by_w.join(wdeg, "w")
    if max_neighbor_degree is not None:
        by_w = by_w.filter(F.col("wdeg") <= F.lit(max_neighbor_degree))
    by_w = by_w.persist()

    left = by_w.select("w", F.col("node").alias("u"), "wdeg")
    right = by_w.select("w", F.col("node").alias("v"))
    pairs = (
        left.join(right, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(1.0 / F.log(F.col("wdeg").cast("double"))).alias(
                "adamic_adar"
            ),
            F.sum(1.0 / F.col("wdeg").cast("double")).alias("resource_alloc"),
        )
        .filter(F.col("common") >= F.lit(min_common))
    )
    if exclude_edges:
        pairs = pairs.join(
            und,
            (pairs["u"] == und["a"]) & (pairs["v"] == und["b"]),
            "left_anti",
        )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    out = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common",
            (
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")).cast("double")
            ).alias("jaccard"),
            "adamic_adar",
            "resource_alloc",
            (F.col("du").cast("long") * F.col("dv")).alias("pref_attach"),
        )
    )
    return out, (und, deg, by_w)
