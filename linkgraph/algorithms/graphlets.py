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
    k_cliques,
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


def _hub_filtered(graph: LinkGraph, und: DataFrame, max_degree: int):
    """Induced subgraph on vertices of degree ≤ max_degree (module
    docstring: the well-defined hub-exclusion trade)."""
    full_deg = _degrees_of(und)
    keep = full_deg.filter(F.col("deg") <= max_degree).select(ID)
    und = und.join(keep.select(F.col(ID).alias("a")), "a").join(
        keep.select(F.col(ID).alias("b")), "b"
    )
    return und, LinkGraph(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


def graphlet_orbits4(
    graph: LinkGraph, max_degree: int | None = None
) -> DataFrame:
    """Per-vertex graphlet degree vector — induced counts of the 15
    Pržulj orbits over all connected ≤4-node graphlets — as
    DataFrame[id, o0..o14], zero-filled over every node.

    Orbit map: o0 degree · o1 wedge end · o2 wedge center · o3 triangle ·
    o4 P4 end · o5 P4 interior · o6 claw leaf · o7 claw center · o8 C4 ·
    o9 paw tail · o10 paw triangle (plain) · o11 paw attachment ·
    o12 diamond deg-2 · o13 diamond deg-3 · o14 K4. The GDV is the node
    feature behind graphlet kernels and role discovery (Pržulj; ORCA,
    Hočevar & Demšar, Bioinformatics'14) — this is the distributed
    analogue of ORCA's combinatorial reduction, with every non-induced
    primitive an algebraic aggregate and the containment corrections
    applied per vertex (each equation verified against brute-force
    enumeration in tests).

    Non-induced primitives, all DataFrame-native:
      S1(v)=Σ_{a∈N(v)}(d(a)−1) and o6' from ONE expanded-edge × degree
      join; sumS1, Σt(a), o13'=ΣC(cn(a,v),2), o10'=Σcn·(d(a)−2),
      o9'=Σ(t(a)−cn) from ONE expanded-edge × vertex-stats join;
      o8'/o12' from ONE wedge × pair-cn join (o12' restricts to wedge
      pairs that are edges — no triangle table is ever materialized);
      k4(v) from the kClist oriented listing's corner explode. Closed
      forms need no join at all: o4' = sumS1 − d(d−1) − 2t,
      o5' = (d−1)·S1 − 2t, o7' = C(d,3), o11' = t·(d−2).

    Scale notes: cost class = the pair-cn wedge shuffle (Σ C(d,2)) — same
    as :func:`graphlet_census4`; ``max_degree`` censuses the hub-excluded
    induced subgraph exactly. Aggregates use decimal(38,0) (hub products
    overflow int64); outputs cast to long. No windows, no UDFs.
    """
    und = _canonical_undirected(graph)
    if max_degree is not None:
        und, graph = _hub_filtered(graph, und, max_degree)
    und = und.persist()
    try:
        deg = _degrees_of(und).persist()

        # wedge table (center v0; endpoint pair u<v) — materialized ONCE and
        # reused by both consumers (the pair-cn aggregate and the o8'/o12'
        # join), saving a second adjacency self-join
        adj = und.select(F.col("a").alias("n"), F.col("b").alias("c")).unionByName(
            und.select(F.col("b").alias("n"), F.col("a").alias("c"))
        )
        wedges = (
            adj.select(F.col("n").alias("u"), F.col("c").alias("v0"))
            .join(adj.select(F.col("n").alias("w"), F.col("c").alias("v0")), "v0")
            .filter(F.col("u") < F.col("w"))
            .select("v0", "u", F.col("w").alias("v"))
            .persist()
        )

        # pair-cn over all pairs with ≥1 common neighbor, edge-flagged
        cn = (
            wedges.groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("cn"))
            .join(
                und.select(
                    F.col("a").alias("u"), F.col("b").alias("v"),
                    F.lit(1).alias("is_edge"),
                ),
                ["u", "v"],
                "left",
            )
            .select("u", "v", "cn", F.coalesce("is_edge", F.lit(0)).alias("is_edge"))
            .persist()
        )

        # expanded edges with cn: (v ego, x neighbor, cn of the edge)
        edge_cn = (
            und.join(
                cn.filter("is_edge = 1").select(
                    F.col("u").alias("a"), F.col("v").alias("b"), "cn"
                ),
                ["a", "b"],
                "left",
            )
            .select("a", "b", F.coalesce("cn", F.lit(0)).alias("cn"))
        )
        exp = edge_cn.select(
            F.col("a").alias("v"), F.col("b").alias("x"), "cn"
        ).unionByName(
            edge_cn.select(F.col("b").alias("v"), F.col("a").alias("x"), "cn")
        ).persist()

        # pass 1: neighbor-degree aggregates → S1, o6', and t via Σcn/2
        dx = deg.select(F.col(ID).alias("x"), F.col("deg").alias("dx"))
        p1 = (
            exp.join(dx, "x")
            .groupBy("v")
            .agg(
                F.sum(_dec(F.col("dx") - 1)).alias("s1"),
                F.sum(
                    _dec(F.col("dx") - 1) * (F.col("dx") - 2) / 2
                ).alias("o6p"),
                (F.sum(_dec(F.col("cn"))) / 2).alias("t"),
            )
            .persist()
        )

        # vertex stats joined back to the neighbor side for pass 2
        vstats = (
            deg.join(p1.withColumnRenamed("v", ID), ID, "left")
            .select(
                F.col(ID).alias("x"),
                F.col("deg").alias("dx"),
                F.coalesce("s1", F.lit(0)).alias("s1x"),
                F.coalesce("t", F.lit(0)).alias("tx"),
            )
        )
        p2 = (
            exp.join(vstats, "x")
            .groupBy("v")
            .agg(
                F.sum(_dec(F.col("s1x"))).alias("sum_s1"),
                F.sum(_dec(F.col("tx")) - F.col("cn")).alias("o9p"),
                F.sum(_dec(F.col("cn")) * (F.col("cn") - 1) / 2).alias("o13p"),
                F.sum(_dec(F.col("cn")) * (F.col("dx") - 2)).alias("o10p"),
            )
        )

        # wedge × pair-cn: o8' (all wedge pairs), o12' (edge pairs only)
        p3 = (
            wedges.join(cn, ["u", "v"])
            .groupBy(F.col("v0").alias("v"))
            .agg(
                F.sum(_dec(F.col("cn") - 1)).alias("o8p"),
                F.sum(_dec((F.col("cn") - 1) * F.col("is_edge"))).alias("o12p"),
            )
        )

        # K4 participation per corner — short-circuited on triangle-free
        # graphs (no edge pair has a common neighbor ⇒ no K4), which skips
        # the whole kClist pipeline on bipartite-shaped inputs
        if cn.filter("is_edge = 1").isEmpty():
            # typed empty derived from exp so the id type (string OR
            # encoded long) survives — cf. components._cc_local
            k4v = exp.select("v").limit(0).withColumn(
                "k4", F.lit(0).cast("long")
            )
        else:
            quads = k_cliques(graph, 4)
            k4v = (
                quads.select(F.col("w1").alias("v"))
                .unionByName(quads.select(F.col("w2").alias("v")))
                .unionByName(quads.select(F.col("w3").alias("v")))
                .unionByName(quads.select(F.col("w4").alias("v")))
                .groupBy("v")
                .agg(F.count(F.lit(1)).alias("k4"))
            )

        base = (
            graph.nodes.select(F.col(ID).alias("v"))
            .join(deg.withColumnRenamed(ID, "v"), "v", "left")
            .join(p1, "v", "left")
            .join(p2, "v", "left")
            .join(p3, "v", "left")
            .join(k4v, "v", "left")
            .select(
                "v",
                *[
                    F.coalesce(c, F.lit(0)).cast("decimal(38,0)").alias(c)
                    for c in (
                        "deg", "s1", "o6p", "t", "sum_s1", "o9p", "o13p",
                        "o10p", "o8p", "o12p", "k4",
                    )
                ],
            )
        )

        d_, t_, k4_ = F.col("deg"), F.col("t"), F.col("k4")
        o13 = (F.col("o13p") - 3 * k4_).alias("_o13")
        o12 = (F.col("o12p") - 3 * k4_).alias("_o12")
        with13 = base.select("*", o13, o12)
        c13, c12 = F.col("_o13"), F.col("_o12")
        o8 = (F.col("o8p") - c12 - c13 - 3 * k4_).alias("_o8")
        o9 = (F.col("o9p") - 2 * c12 - 3 * k4_).alias("_o9")
        o10 = (F.col("o10p") - 2 * c12 - 2 * c13 - 6 * k4_).alias("_o10")
        o11 = (t_ * (d_ - 2) - 2 * c13 - 3 * k4_).alias("_o11")
        with_mid = with13.select("*", o8, o9, o10, o11)
        c8, c9, c10, c11 = (
            F.col("_o8"), F.col("_o9"), F.col("_o10"), F.col("_o11")
        )
        out = with_mid.select(
            F.col("v").alias(ID),
            d_.cast("long").alias("o0"),
            (F.col("s1") - 2 * t_).cast("long").alias("o1"),
            (d_ * (d_ - 1) / 2 - t_).cast("long").alias("o2"),
            t_.cast("long").alias("o3"),
            (
                F.col("sum_s1") - d_ * (d_ - 1) - 2 * t_
                - 2 * c8 - 2 * c9 - c10 - 4 * c12 - 2 * c13 - 6 * k4_
            ).cast("long").alias("o4"),
            (
                (d_ - 1) * F.col("s1") - 2 * t_
                - 2 * c8 - c10 - 2 * c11 - 2 * c12 - 4 * c13 - 6 * k4_
            ).cast("long").alias("o5"),
            (
                F.col("o6p") - c9 - c10 - 2 * c12 - c13 - 3 * k4_
            ).cast("long").alias("o6"),
            (
                d_ * (d_ - 1) * (d_ - 2) / 6 - c11 - c13 - k4_
            ).cast("long").alias("o7"),
            c8.cast("long").alias("o8"),
            c9.cast("long").alias("o9"),
            c10.cast("long").alias("o10"),
            c11.cast("long").alias("o11"),
            c12.cast("long").alias("o12"),
            c13.cast("long").alias("o13"),
            k4_.cast("long").alias("o14"),
        )
        out = out.localCheckpoint(eager=True)
        wedges.unpersist()
        cn.unpersist()
        exp.unpersist()
        p1.unpersist()
        deg.unpersist()
    finally:
        und.unpersist()
    return out
