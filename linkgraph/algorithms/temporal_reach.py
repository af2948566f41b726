"""Temporal reachability — earliest-arrival over time-respecting paths.

NOT in the reference (``mercury/graph`` has no time-aware traversal); the
canonical temporal-graph question — "starting from these nodes at time t,
what can be reached through edges whose timestamps never go backward" —
underlies contagion tracing, information-flow audits, and commit-lineage
queries over the same event streams this engine already sessionizes.

Semantics (standard earliest-arrival temporal path, Wu et al., VLDB'14):
a path e1..ek is time-respecting iff ts(e_{i+1}) >= arrival(e_i) + delay
(strictly > with ``strict=True``); arrival through an edge IS the edge's
timestamp. Minimizing earliest arrival is sufficient for reachability:
arriving earlier can only enable a superset of outgoing edges.

Distributed plan mirrors :mod:`linkgraph.algorithms.sssp` (label-correcting
supersteps): the frontier joins the once-partitioned edge table, the time
constraint filters usable edges, one algebraic min-agg produces candidate
arrivals, and only improved nodes feed the next round — frontier-side-only
shuffle, edges scanned in place, one action per superstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans

_INF = float("inf")


def _reach_round(
    state: DataFrame,
    frontier: DataFrame,
    edges: DataFrame,
    delay: float,
    strict: bool,
) -> DataFrame:
    """One superstep: expand the frontier along time-usable edges, min-merge
    arrivals into ``state``, flag improvements. Factored out for the
    plan-audit tests (stays algebraic and window-free)."""
    usable = (
        F.col("_ts") > F.col("arrival") + F.lit(delay)
        if strict
        else F.col("_ts") >= F.col("arrival") + F.lit(delay)
    )
    cand = (
        frontier.join(edges, frontier[ID] == edges["u"])
        .filter(usable)
        .select(F.col("v").alias(ID), F.col("_ts").alias("a"))
        .groupBy(ID)
        .agg(F.min("a").alias("a"))
    )
    return state.join(cand, ID, "full").select(
        ID,
        F.least(
            F.coalesce("arrival", F.lit(_INF)), F.coalesce("a", F.lit(_INF))
        ).alias("arrival"),
        (
            F.col("a").isNotNull()
            & (F.col("a") < F.coalesce("arrival", F.lit(_INF)))
        ).alias("_imp"),
    )


def temporal_reachability(
    graph: LinkGraph,
    sources: DataFrame | list,
    ts_col: str = "ts",
    start: float = float("-inf"),
    delay: float = 0.0,
    strict: bool = False,
    max_iter: int = 100,
) -> DataFrame:
    """DataFrame[id, arrival] — the earliest time each node is reachable
    from any source via a time-respecting path; sources carry ``start``,
    unreachable nodes emit no row. ``ts_col`` must be numeric (cast
    timestamps to epoch seconds upstream); ``delay`` is the minimum dwell
    between consecutive edges."""
    spark = graph.edges.sparkSession
    if ts_col not in graph.edges.columns:
        raise ValueError(f"edges have no {ts_col!r} column")
    if isinstance(sources, list):
        if not sources:
            raise ValueError("sources must be non-empty")
        src_df = spark.createDataFrame([(x,) for x in sources], [ID])
    else:
        src_df = sources.select(F.col(sources.columns[0]).alias(ID))
    src_df = src_df.join(graph.nodes.select(ID), ID, "left_semi")
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        edges = pin_partitioned(
            graph.edges.select(
                F.col(SRC).alias("u"), F.col(DST).alias("v"),
                F.col(ts_col).cast("double").alias("_ts"),
            )
            .distinct()  # parallel same-time edges are one opportunity
            .repartition(npart, "u")
        )
        state = src_df.select(
            ID, F.lit(float(start)).alias("arrival")
        ).distinct().localCheckpoint(eager=True)
        frontier = state
        for _ in range(max_iter):
            merged = _reach_round(
                state, frontier, edges, delay, strict
            ).localCheckpoint(eager=False)
            n_imp = merged.filter("_imp").count()  # materializes the round
            if n_imp == 0:
                state = merged.select(ID, "arrival")
                break
            frontier = merged.filter("_imp").select(ID, "arrival").localCheckpoint(
                eager=False
            )
            state = merged.select(ID, "arrival")
        else:
            edges.unpersist()
            raise RuntimeError(
                f"temporal_reachability did not converge within max_iter="
                f"{max_iter} supersteps — raise max_iter (rounds are bounded "
                "by the longest chain of strictly improving arrivals)"
            )
        edges.unpersist()
    return state.join(graph.nodes.select(ID), ID, "left_semi")
