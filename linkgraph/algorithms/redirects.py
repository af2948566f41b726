"""Redirect-chain resolution — pointer doubling over a functional graph.

NOT present in the reference; added because it is THE standard web-graph
preprocessing step: a crawl yields a redirect map (url → url, each source
has exactly one target) and every downstream graph wants links rewritten
to FINAL targets. Chains can be long (www → apex → https → cdn → ...) and
100 TB of them cannot be chased a hop at a time.

Distributed shape: classic pointer doubling (the two-star/CC family's
trick applied to a functional graph). State is one row per node
(id, ptr, hops, done); each superstep composes the pointer with itself —

    ptr'(v)  = ptr(ptr(v));  hops'(v) = hops(v) + hops(ptr(v))
    done'(v) = done(ptr(v))  (a done pointer IS the final target)

— so chains of length L resolve in ⌈log₂ L⌉ rounds, each round one
self-join shuffle keyed by ptr. After ⌈log₂ n⌉ + 1 rounds any node still
unresolved provably sits ON or LEADS INTO a redirect cycle (its chain
never reaches a terminal); those are flagged ``on_cycle`` with NULL
target/hops rather than looping forever — exactly the rows a crawler
quarantines. Early exit when every node is done.

hops is the EXACT original chain length (doubling sums segment lengths),
useful for "redirect depth" quality signals.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC
from linkgraph.session import static_plans


def resolve_redirects(redirects: DataFrame, max_rounds: int | None = None) -> DataFrame:
    """DataFrame[id, target, hops, on_cycle] for EVERY node appearing in
    the redirect map (sources and targets). Terminals (never a source)
    resolve to themselves at 0 hops. ``redirects``'s first two columns are
    (src, dst); a source appearing twice is an error — a redirect map is a
    function, and silently picking one target would corrupt every chain
    through it. Self-redirects (u → u) are 1-cycles.

    ``max_rounds`` defaults to ⌈log₂ n⌉ + 1 (n = node count) — enough for
    ANY acyclic chain, so survivors are exactly the cycle-bound nodes."""
    a, b = redirects.columns[0], redirects.columns[1]
    edges = redirects.select(F.col(a).alias(SRC), F.col(b).alias(DST))
    spark = edges.sparkSession

    dup = (
        edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("c")).filter("c > 1")
    )
    if dup.limit(1).count() > 0:
        raise ValueError(
            "redirect map is not functional: some source has multiple targets"
        )

    with static_plans(spark):
        nodes = (
            edges.select(F.col(SRC).alias(ID))
            .unionByName(edges.select(F.col(DST).alias(ID)))
            .distinct()
        )
        n = nodes.count()
        rounds = (
            max_rounds
            if max_rounds is not None
            else int(math.ceil(math.log2(max(n, 2)))) + 1
        )
        # terminals: ptr = self, hops = 0, done; sources: ptr = dst, 1 hop,
        # done iff the target is a terminal (resolved by the first compose)
        state = (
            nodes.join(edges, nodes[ID] == edges[SRC], "left")
            .select(
                ID,
                F.coalesce(DST, F.col(ID)).alias("ptr"),
                F.when(F.col(DST).isNull(), F.lit(0))
                .otherwise(1)
                .cast("long")
                .alias("hops"),
                F.col(DST).isNull().alias("done"),
            )
            .localCheckpoint(eager=True)
        )
        for _ in range(rounds):
            t = state.select(
                F.col(ID).alias("_tid"),
                F.col("ptr").alias("_tptr"),
                F.col("hops").alias("_thops"),
                F.col("done").alias("_tdone"),
            )
            nxt = (
                state.join(t, state["ptr"] == t["_tid"], "left")
                .select(
                    ID,
                    F.when(F.col("done"), F.col("ptr"))
                    .otherwise(F.coalesce("_tptr", F.col("ptr")))
                    .alias("ptr"),
                    F.when(F.col("done"), F.col("hops"))
                    .otherwise(
                        F.col("hops") + F.coalesce("_thops", F.lit(0).cast("long"))
                    )
                    .alias("hops"),
                    (
                        F.col("done") | F.coalesce("_tdone", F.lit(False))
                    ).alias("done"),
                )
                .localCheckpoint(eager=True)
            )
            remaining = nxt.filter(~F.col("done")).limit(1).count()
            state = nxt
            if remaining == 0:
                break
    return state.select(
        ID,
        F.when(F.col("done"), F.col("ptr")).alias("target"),
        F.when(F.col("done"), F.col("hops")).alias("hops"),
        (~F.col("done")).alias("on_cycle"),
    )


def rewrite_edges(
    edges: DataFrame,
    resolved: DataFrame,
    drop_cycles: bool = True,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Rewrite a link table through a resolved redirect map: every endpoint
    that appears in ``resolved`` (a :func:`resolve_redirects` result) is
    replaced by its final target, parallel links collapse with summed
    weight — the step that turns a raw crawl's edge list into the graph
    over CANONICAL pages. Endpoints absent from the map pass through
    unchanged (not every URL redirects).

    ``drop_cycles``: links touching a cycle-bound endpoint (NULL target)
    are dropped — the crawler's quarantine semantics; with False the
    cycle-bound endpoint keeps its original un-rewritten id instead.
    Self-loops created BY rewriting (a page linking to a redirect of
    itself) drop by default.

    Plan: two broadcast-or-shuffle joins (one per endpoint — Spark picks by
    the map's size stats) + ONE algebraic (src, dst) sum shuffle. The third
    column of ``edges``, if present, is the weight; otherwise weight 1 per
    link."""
    cols = edges.columns
    a, b = cols[0], cols[1]
    wcol = F.col(cols[2]).cast("double") if len(cols) > 2 else F.lit(1.0)
    e = edges.select(F.col(a).alias(SRC), F.col(b).alias(DST), wcol.alias("w"))
    m = resolved.select(
        F.col(resolved.columns[0]).alias("_k"),
        F.col("target").alias("_t"),
        F.col("on_cycle").alias("_c"),
    )
    for side in (SRC, DST):
        # a cycle-bound endpoint becomes NULL (quarantine) or, with
        # drop_cycles=False, keeps its ORIGINAL un-rewritten id
        on_cycle_value = F.lit(None) if drop_cycles else F.col(side)
        e = (
            e.join(
                m.withColumnsRenamed(
                    {"_k": f"_k{side}", "_t": f"_t{side}", "_c": f"_c{side}"}
                ),
                e[side] == F.col(f"_k{side}"),
                "left",
            )
            .withColumn(
                side,
                F.when(F.col(f"_c{side}") == True, on_cycle_value)  # noqa: E712
                .otherwise(F.coalesce(f"_t{side}", side)),
            )
            .drop(f"_k{side}", f"_t{side}", f"_c{side}")
        )
    if drop_cycles:
        e = e.filter(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
    if drop_self_loops:
        e = e.filter(F.col(SRC) != F.col(DST))
    return e.groupBy(SRC, DST).agg(F.sum("w").alias("weight"))
