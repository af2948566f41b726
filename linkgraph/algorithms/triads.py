"""Directed dyad and triad census — Holland–Leinhardt MAN classification
(the 16 directed-triple isomorphism classes: 003 012 102 021D 021U 021C
111D 111U 030T 030C 201 120D 120U 120C 210 300).

NOT in the reference (no triad code under ``mercury/``); the classic
social-network structural signature (Holland & Leinhardt'70; the
subtraction scheme is Batagelj & Mrvar, Social Networks'01 — networkx
``triadic_census`` parity is asserted in tests).

Method — enumerate ONLY triples with ≥2 connected pairs, closed-form the
rest:

- pair table: one groupBy over the distinct loop-free arc set → canonical
  (a<b, a→b bit, b→a bit); dyad census (mutual/asym/null) is one aggregate
  over it.
- wedge enumeration: the undirected-support adjacency self-join (center w,
  endpoints u<v) carries BOTH direction bits per leg, so only the closing
  pair (u,v) needs a join; each wedge's six direction bits form a 6-bit
  code mapped through a 64-entry lookup derived from networkx's canonical
  classification (pinned by parity tests). Triples with two connected
  pairs are enumerated exactly once (their only wedge center); triples
  with three connected pairs three times — the 3-connected classes divide
  by 3.
- closed forms: a connected pair {u,v} has n − d(u) − d(v) + cn(u,v)
  third vertices touching neither endpoint, so 012/102 are one aggregate
  over the pair×degree×cn join; 003 = C(n,3) − everything else.

Scale notes: cost class = the wedge shuffle Σ C(d,2) over the support
(same as the graphlet census); the 64-row code histogram and 16-class
assembly are driver-side scalars. All aggregates algebraic; decimal(38,0)
outputs (C(n,3) overflows int64 past ~3.8M nodes). No windows, no UDFs.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph

# code = (w→u) + 2(u→w) + 4(w→v) + 8(v→w) + 16(u→v) + 32(v→u), derived
# once from networkx.triadic_census on all 64 labeled 3-node digraphs
_LOOKUP = [
    "003", "012", "012", "102", "012", "021D", "021C", "111U",
    "012", "021C", "021U", "111D", "102", "111U", "111D", "201",
    "012", "021C", "021D", "111U", "021U", "030T", "030T", "120U",
    "021C", "030C", "030T", "120C", "111D", "120C", "120D", "210",
    "012", "021U", "021C", "111D", "021C", "030T", "030C", "120C",
    "021D", "030T", "030T", "120D", "111U", "120U", "120C", "210",
    "102", "111D", "111U", "201", "111D", "120D", "120C", "210",
    "111U", "120C", "120U", "210", "201", "210", "210", "300",
]
_THREE_CONNECTED = {"030T", "030C", "120D", "120U", "120C", "210", "300"}
TRIAD_CLASSES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def _pair_table(graph: LinkGraph) -> DataFrame:
    """Canonical connected-pair table (a < b, ab: a→b, ba: b→a) over the
    distinct loop-free arc set."""
    arcs = (
        graph.edges.select(F.col(SRC).alias("s"), F.col(DST).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    return (
        arcs.select(
            F.least("s", "d").alias("a"),
            F.greatest("s", "d").alias("b"),
            F.when(F.col("s") < F.col("d"), 1).otherwise(0).alias("ab_"),
            F.when(F.col("s") > F.col("d"), 1).otherwise(0).alias("ba_"),
        )
        .groupBy("a", "b")
        .agg(F.max("ab_").alias("ab"), F.max("ba_").alias("ba"))
    )


def dyad_census(graph: LinkGraph) -> DataFrame:
    """One-row DataFrame[mutual, asym, null] — Holland–Leinhardt dyad
    census over the distinct loop-free arc set (null = unconnected pairs
    among ALL C(n,2) node pairs)."""
    spark = graph.edges.sparkSession
    n = graph.nodes.count()
    row = _pair_table(graph).agg(
        F.sum((F.col("ab") * F.col("ba")).cast("long")).alias("m"),
        F.count(F.lit(1)).alias("conn"),
    ).collect()[0]
    m = int(row["m"] or 0)
    conn = int(row["conn"] or 0)
    total = n * (n - 1) // 2
    return spark.createDataFrame(
        [(Decimal(m), Decimal(conn - m), Decimal(total - conn))],
        "mutual decimal(38,0), asym decimal(38,0), null decimal(38,0)",
    )


def triad_census(graph: LinkGraph) -> DataFrame:
    """One-row DataFrame[t003 .. t300] (decimal(38,0)) — counts of every
    unordered node triple by MAN class, networkx ``triadic_census``
    parity. See module docstring for the subtraction scheme."""
    spark = graph.edges.sparkSession
    n = graph.nodes.count()
    pairs = _pair_table(graph).persist()
    try:
        # support degree and common-neighbor counts
        adjb = pairs.select(
            F.col("a").alias("n"), F.col("b").alias("c"),
            F.col("ab").alias("n2c"), F.col("ba").alias("c2n"),
        ).unionByName(
            pairs.select(
                F.col("b").alias("n"), F.col("a").alias("c"),
                F.col("ba").alias("n2c"), F.col("ab").alias("c2n"),
            )
        )
        deg = adjb.groupBy(F.col("n").alias(ID)).agg(
            F.count(F.lit(1)).alias("deg")
        )

        # wedge enumeration with all six direction bits; only the closing
        # (u,v) pair needs a join (legs carry their bits from adjb).
        # The wedge rows are COLLAPSED to one row per endpoint pair with 16
        # leg-code counters in the SAME aggregate that used to compute cn —
        # the former plan materialized the wedge table (Σ C(d,2) rows) and
        # shuffled it AGAIN into the closing join and a second cn groupBy;
        # this one pays a single wedge-sized exchange with map-side partial
        # aggregation (guide §2.3 "aggregate before you shuffle") and joins
        # pairs at distinct-pair granularity.
        left = adjb.select(
            F.col("c").alias("w"), F.col("n").alias("u"),
            F.col("c2n").alias("wu"), F.col("n2c").alias("uw"),
        )
        right = adjb.select(
            F.col("c").alias("w"), F.col("n").alias("v"),
            F.col("c2n").alias("wv"), F.col("n2c").alias("vw"),
        )
        leg = (
            F.col("wu") + 2 * F.col("uw") + 4 * F.col("wv") + 8 * F.col("vw")
        )
        wp = (
            left.join(right, "w")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(
                *[
                    F.sum((leg == k).cast("long")).alias(f"c{k}")
                    for k in range(16)
                ]
            )
            .persist()
        )
        closed = wp.join(
            pairs.select(
                F.col("a").alias("u"), F.col("b").alias("v"),
                F.col("ab").alias("uv"), F.col("ba").alias("vu"),
            ),
            ["u", "v"],
            "left",
        ).groupBy(
            F.coalesce("uv", F.lit(0)).alias("uv"),
            F.coalesce("vu", F.lit(0)).alias("vu"),
        ).agg(*[F.sum(f"c{k}").alias(f"c{k}") for k in range(16)])
        hist: dict[int, int] = {}
        for r in closed.collect():
            base = 16 * int(r["uv"]) + 32 * int(r["vu"])
            for k in range(16):
                c = int(r[f"c{k}"] or 0)
                if c:
                    hist[base + k] = hist.get(base + k, 0) + c

        # closed forms for the one-connected-pair classes; cn per pair is
        # the sum of the 16 leg-code counters
        da = deg.select(F.col(ID).alias("a"), F.col("deg").alias("da"))
        db = deg.select(F.col(ID).alias("b"), F.col("deg").alias("db"))
        cn_col = sum((F.col(f"c{k}") for k in range(1, 16)), F.col("c0"))
        cn = wp.select(
            F.col("u").alias("a"), F.col("v").alias("b"), cn_col.alias("cn")
        )
        iso_rows = (
            pairs.join(da, "a")
            .join(db, "b")
            .join(cn, ["a", "b"], "left")
            .select(
                (F.col("ab") * F.col("ba")).alias("is_mutual"),
                (
                    F.lit(n).cast("decimal(38,0)")
                    - F.col("da")
                    - F.col("db")
                    + F.coalesce("cn", F.lit(0))
                ).alias("iso"),
            )
            .groupBy("is_mutual")
            .agg(F.sum("iso").alias("s"))
            .collect()
        )
        wp.unpersist()
    finally:
        pairs.unpersist()

    cnt = {c: 0 for c in TRIAD_CLASSES}
    for code, c in hist.items():
        cnt[_LOOKUP[code]] += c
    for cls in _THREE_CONNECTED:
        cnt[cls] //= 3
    for r in iso_rows:
        cnt["102" if r["is_mutual"] else "012"] += int(r["s"] or 0)
    cnt["003"] = (
        n * (n - 1) * (n - 2) // 6
        - sum(v for k, v in cnt.items() if k != "003")
    )
    schema = ", ".join(f"t{c.lower()} decimal(38,0)" for c in TRIAD_CLASSES)
    return spark.createDataFrame(
        [tuple(Decimal(cnt[c]) for c in TRIAD_CLASSES)], schema
    )


def motif_significance(
    graph: LinkGraph, n_null: int = 5, rounds: int = 3, seed: int = 42
) -> DataFrame:
    """DataFrame[triad, observed, null_mean_millionths, null_std_millionths,
    z_millionths] — the Milo et al. (Science'02) network-motif significance
    profile over the 13 connected triad classes: z(c) = (obs(c) − μ_null(c))
    / σ_null(c) against ``n_null`` degree-preserving rewired graphs
    (:func:`linkgraph.algorithms.rewire.rewire_edges`, seeds seed..seed+n−1,
    ``rounds`` swap rounds each).

    Conventions, stated: σ is the population std over the null samples;
    classes where σ = 0 get a NULL z (not ±inf); the disconnected classes
    (003/012/102) are excluded — their counts are dominated by n and carry
    no motif signal. Directed rewiring preserves in/out degree sequences
    but NOT the mutual-dyad count (the standard directed configuration
    model caveat). Deterministic: same graph/seed ⇒ same profile.

    Cost: (n_null + 1) triad censuses + n_null·rounds swap rounds — each
    component's scale story is its own docstring's; the z arithmetic is
    driver-side over 13×(n_null+1) scalars."""
    if n_null < 2:
        raise ValueError(f"n_null must be >= 2, got {n_null}")
    from linkgraph.algorithms.rewire import rewire_edges

    spark = graph.edges.sparkSession
    connected = [c for c in TRIAD_CLASSES if c not in ("003", "012", "102")]

    def census_counts(g: LinkGraph) -> dict:
        row = triad_census(g).collect()[0]
        return {c: int(row[f"t{c.lower()}"]) for c in connected}

    obs = census_counts(graph)
    nulls = []
    for i in range(n_null):
        ne = rewire_edges(graph, rounds=rounds, seed=seed + i)
        ng = LinkGraph(ne, nodes=graph.nodes, keys={"directed": True})
        nulls.append(census_counts(ng))

    out = []
    for c in connected:
        vals = [nl[c] for nl in nulls]
        mu = sum(vals) / n_null
        var = sum((v - mu) ** 2 for v in vals) / n_null
        sd = var ** 0.5
        z = (obs[c] - mu) / sd if sd > 0 else None
        out.append(
            (
                c,
                obs[c],
                int(round(mu * 1e6)),
                int(round(sd * 1e6)),
                int(round(z * 1e6)) if z is not None else None,
            )
        )
    return spark.createDataFrame(
        out,
        "triad string, observed bigint, null_mean_millionths bigint, "
        "null_std_millionths bigint, z_millionths bigint",
    )
