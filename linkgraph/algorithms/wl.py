"""Weisfeiler–Lehman color refinement — structural node colors and graph
fingerprints.

NOT in the reference; the 1-WL test is the standard structural-role
assignment (two nodes share a color after k rounds iff 1-WL cannot tell
their k-hop neighborhoods apart) and its color histogram is the classic
whole-graph fingerprint (WL graph kernels; GIN expressiveness baseline).
Operational use here: detect structural drift between graph snapshot
rebuilds beyond edge counts, and bucket nodes into automorphism-ish roles.

Textbook WL hashes the SORTED multiset of neighbor colors — a hub-sized
sort. This implementation replaces it with a COMMUTATIVE multiset hash:
each neighbor color maps to a 30-bit integer (md5 bucket mod 2^30 — the
per-node ANSI sum then stays under 2^63 even at 10^9-degree hubs) and the
multiset is its sum modulo 2^61−1 — an algebraic aggregate (map-side combinable,
hub-safe, no sort, no collect_list), engine-portable (the DuckDB oracle
replays it digit for digit). Sum-mod multiset hashing distinguishes
multisets up to collisions (~2^-30 per pair per round), the same trade
every hashed-WL implementation makes.

Color at round 0 is the node's total degree; round k+1 is
``md5(color || ':' || multiset_hash(neighbor colors))`` truncated to 16
hex chars. Undirected graphs use both endpoints (LinkGraph already
materializes both directions); directed graphs refine on in-neighbors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans

_MOD = (1 << 61) - 1


def _bucket32(col: F.Column) -> F.Column:
    """Stable 32-bit integer from a color string: first 8 md5 hex chars
    (identical in DuckDB: CAST('0x' || substring(md5(c),1,8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def wl_colors(
    graph: LinkGraph, rounds: int = 3, out: str = "wl_color"
) -> DataFrame:
    """DataFrame[id, <out>] — the node's 1-WL color after ``rounds``
    refinements (16 hex chars; round 0 = total degree as a string)."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    with static_plans(graph.edges.sparkSession):
        npart = int(
            graph.edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        edges = pin_partitioned(
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .repartition(npart, "u")
        )
        deg = (
            edges.select(F.col("u").alias(ID))
            .unionByName(edges.select(F.col("v").alias(ID)))
            .groupBy(ID)
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        colors = graph.nodes.select(ID).join(deg, ID, "left").select(
            ID, F.coalesce(F.col("_d"), F.lit(0)).cast("string").alias("c")
        ).localCheckpoint(eager=True)
        for _ in range(rounds):
            # message = neighbor's color bucket, summed mod 2^61-1 per node;
            # in-neighbors refine dst (undirected graphs store both ways)
            # 30-bit buckets: the per-node sum must stay under 2^63 in ANSI
            # mode even for a 10^9-degree hub (2^30 x 2^33 < 2^63); the
            # collision trade is 2^-30 per color pair, still negligible
            msg = (
                # shuffle_hash: build the node-sized color table, stream
                # the pinned edge table (guide §3.1)
                edges.join(colors.hint("shuffle_hash"), edges["u"] == colors[ID])
                .select(
                    F.col("v").alias(ID),
                    F.pmod(_bucket32(F.col("c")), F.lit(1 << 30)).alias("b"),
                )
                .groupBy(ID)
                .agg(F.pmod(F.sum("b"), F.lit(_MOD)).alias("ms"))
            )
            colors = (
                colors.join(msg, ID, "left")
                .select(
                    ID,
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("c"),
                                F.coalesce(
                                    F.col("ms").cast("string"), F.lit("-")
                                ),
                            )
                        ),
                        1,
                        16,
                    ).alias("c"),
                )
                .localCheckpoint(eager=False)
            )
        # materialize before releasing the pinned edges (per-round
        # checkpoints above are lazy)
        colors = colors.localCheckpoint(eager=True)
        edges.unpersist()
        return colors.select(ID, F.col("c").alias(out))


def wl_fingerprint(graph: LinkGraph, rounds: int = 3) -> str:
    """Order-insensitive whole-graph signature: the WL color multiset
    hashed commutatively (sum of color buckets mod 2^61−1, then md5 with
    the node count). Two isomorphic graphs always agree; structural drift
    between snapshot rebuilds flips it with high probability."""
    import hashlib

    colors = wl_colors(graph, rounds)
    # 24-bit buckets here: the global sum must stay under 2^63 (ANSI mode
    # throws on overflow) even at 10^10 nodes; per-node sums in wl_colors
    # use 30-bit buckets (2^30 x hub degree stays far below the limit)
    row = colors.agg(
        F.pmod(
            F.sum(F.pmod(_bucket32(F.col("wl_color")), F.lit(1 << 24))),
            F.lit(_MOD),
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return hashlib.md5(f"{row['s']}:{row['n']}".encode()).hexdigest()[:16]
