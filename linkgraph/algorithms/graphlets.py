"""4-node graphlet census — induced counts of the six connected 4-node
graphlets (P4 path, K1,3 claw, C4 cycle, paw, diamond, K4) plus the 3-node
counts (wedges, triangles), from closed-form combinatorics over ONE
pair-common-neighbor aggregate and the oriented K4 listing.

NOT in the reference (no subgraph-census code under ``mercury/``); the
graph-mining workhorse behind graphlet degree distributions / GDV kernels
(Pržulj; ORCA, Hočevar & Demšar, Bioinformatics'14 — whose
combinatorial-reduction strategy this is the distributed analogue of).

Method — count NON-induced occurrences with algebraic aggregates, then
back-substitute the containment matrix to induced counts:

    wedges   = Σ_v C(d(v), 2)
    T        = Σ_{uv∈E} cn(u,v) / 3                    (triangles)
    claw'    = Σ_v C(d(v), 3)
    paw'     = Σ_v T(v)·(d(v) − 2)
    P4'      = Σ_{uv∈E} (d(u)−1)(d(v)−1) − 3T
    D'       = Σ_{uv∈E} C(cn(u,v), 2)                  (diamond-shaped)
    S        = Σ_{u<v}  C(cn(u,v), 2) / 2              (all C4 subgraphs)
    K4       = oriented 4-clique listing (exact)

    diamond  = D'  − 6·K4
    cycle4   = S   − diamond  − 3·K4
    paw      = paw' − 4·diamond − 12·K4
    claw     = claw' − paw − 2·diamond − 4·K4
    p4_path  = P4' − 2·paw − 6·diamond − 4·cycle4 − 12·K4

(Containment coefficients: a K4 holds 12 P4 / 4 claw / 3 C4 / 12 paw /
6 diamond subgraphs; a diamond holds 6 P4 / 2 claw / 1 C4 / 4 paw; a paw
holds 2 P4 / 1 claw; a C4 holds 4 P4.)

Scale notes: everything reduces to the pair-cn table — the adjacency wedge
self-join grouped by endpoint pair — the same shuffle shape as
:func:`linkgraph.algorithms.triangles.square_count`, whose cost is bounded
by Σ C(d,2) and therefore hub-dominated; for hub-heavy graphs pass
``max_degree`` to census the induced subgraph on vertices of degree ≤ cap
instead (EXACT on that well-defined subgraph — the standard
degree-bounded-census trade, vs. silently mixing capped and uncapped
aggregate terms, which would make the back-substitution over- or
under-shoot unpredictably). The K4 term reuses the degree-ordered
orientation whose out-degree is O(sqrt(m)). Every aggregate is algebraic
(map-side partial); no windows, no UDFs, nothing driver-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import ID, LinkGraph
from linkgraph.algorithms.triangles import (
    _canonical_undirected,
    _degrees_of,
    clique4_count,
)


def _dec(c):
    # decimal(38,0) accumulators: products of hub degrees overflow int64
    # (ANSI mode throws) long before 100-TB edge counts do
    return c.cast("decimal(38,0)")


def graphlet_census4(
    graph: LinkGraph, max_degree: int | None = None
) -> DataFrame:
    """One-row DataFrame[wedges, triangles, p4_path, claw, cycle4, paw,
    diamond, k4] — induced counts over the canonical simple undirected
    graph. ``max_degree`` drops hub vertices first and censuses the
    induced subgraph on the rest (exact there; module docstring)."""
    spark = graph.edges.sparkSession
    und = _canonical_undirected(graph)
    if max_degree is not None:
        full_deg = _degrees_of(und)
        keep = full_deg.filter(F.col("deg") <= max_degree).select(ID)
        und = und.join(
            keep.select(F.col(ID).alias("a")), "a"
        ).join(keep.select(F.col(ID).alias("b")), "b")
        graph = LinkGraph(
            und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )  # re-wrapped so the K4 listing sees the same subgraph
    und = und.persist()
    try:
        # degrees WITHIN the (possibly filtered) censused graph
        deg = _degrees_of(und).persist()

        # adjacency (n, c): each undirected edge in both directions; wedge
        # self-join on the shared center c, grouped to cn per endpoint pair
        adj = und.select(F.col("a").alias("n"), F.col("b").alias("c")).unionByName(
            und.select(F.col("b").alias("n"), F.col("a").alias("c"))
        )
        cn = (
            adj.select(F.col("n").alias("u"), "c")
            .join(adj.select(F.col("n").alias("v"), "c"), "c")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("cn"))
            .persist()
        )

        # split pair-cn by edge membership: edge pairs feed T/T(v)/D',
        # the full table feeds S
        edge_cn = (
            und.join(
                cn,
                (und["a"] == cn["u"]) & (und["b"] == cn["v"]),
                "left",
            )
            .select("a", "b", F.coalesce("cn", F.lit(0)).alias("cn"))
            .persist()
        )

        # per-vertex degree terms: wedges, claw', and the (d−1) factors
        deg_row = deg.agg(
            F.sum(_dec(F.col("deg")) * (F.col("deg") - 1) / 2).alias("wedges"),
            F.sum(
                _dec(F.col("deg"))
                * (F.col("deg") - 1)
                * (F.col("deg") - 2)
                / 6
            ).alias("claw_ni"),
        ).collect()[0]
        wedges = int(deg_row["wedges"] or 0)
        claw_ni = int(deg_row["claw_ni"] or 0)

        # per-edge terms: Σ cn (= 3T), Σ C(cn,2) (= D'), Σ (du−1)(dv−1)
        da = deg.select(F.col(ID).alias("a"), F.col("deg").alias("da"))
        db = deg.select(F.col(ID).alias("b"), F.col("deg").alias("db"))
        e_row = (
            edge_cn.join(da, "a")
            .join(db, "b")
            .agg(
                F.sum(_dec(F.col("cn"))).alias("cn_sum"),
                F.sum(_dec(F.col("cn")) * (F.col("cn") - 1) / 2).alias("d_ni"),
                F.sum(_dec(F.col("da") - 1) * (F.col("db") - 1)).alias("walk3"),
            )
            .collect()[0]
        )
        tri3 = int(e_row["cn_sum"] or 0)
        assert tri3 % 3 == 0
        triangles = tri3 // 3
        d_ni = int(e_row["d_ni"] or 0)
        p4_ni = int(e_row["walk3"] or 0) - tri3

        # paw' = Σ_v T(v)(d(v)−2); T(v) = Σ_{u∈N(v)} cn(u,v) / 2 — expand
        # edge-cn to both endpoints, one algebraic groupBy
        tv = (
            edge_cn.select(F.col("a").alias(ID), "cn")
            .unionByName(edge_cn.select(F.col("b").alias(ID), "cn"))
            .groupBy(ID)
            .agg(F.sum(_dec(F.col("cn"))).alias("tv2"))
        )
        paw_row = (
            tv.join(deg, ID)
            .agg(F.sum(F.col("tv2") * (F.col("deg") - 2) / 2).alias("paw_ni"))
            .collect()[0]
        )
        paw_ni = int(paw_row["paw_ni"] or 0)

        # S: all-pairs Σ C(cn,2) / 2 (each C4 subgraph has two opposite
        # pairs, each seeing the other two nodes as common neighbors)
        s_row = cn.agg(
            F.sum(_dec(F.col("cn")) * (F.col("cn") - 1) / 2).alias("s2")
        ).collect()[0]
        squares = int(s_row["s2"] or 0) // 2

        k4 = clique4_count(graph)

        # back-substitute the containment matrix (module docstring)
        diamond = d_ni - 6 * k4
        cycle4 = squares - diamond - 3 * k4
        paw = paw_ni - 4 * diamond - 12 * k4
        claw = claw_ni - paw - 2 * diamond - 4 * k4
        p4_path = p4_ni - 2 * paw - 6 * diamond - 4 * cycle4 - 12 * k4

        cn.unpersist()
        edge_cn.unpersist()
        deg.unpersist()
    finally:
        und.unpersist()

    return spark.createDataFrame(
        [
            (
                wedges,
                triangles,
                p4_path,
                claw,
                cycle4,
                paw,
                diamond,
                k4,
            )
        ],
        "wedges bigint, triangles bigint, p4_path bigint, claw bigint, "
        "cycle4 bigint, paw bigint, diamond bigint, k4 bigint",
    )
