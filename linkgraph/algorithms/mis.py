"""Maximal independent set — deterministic Luby rounds on hash priorities.

NOT present in the reference (no independent-set / coloring / matching
utilities in ``mercury/graph``); added because MIS is the foundational
symmetry-breaking primitive of distributed graph computing — conflict-free
scheduling, greedy coloring, landmark spreading all reduce to it.

Luby's algorithm with md5 priorities instead of per-round RNG: node v
joins the set when its priority is a strict local minimum among its
UNDECIDED neighbors; v and its neighbors then leave the undecided pool.
Each round kills ≥ half the remaining edges in expectation under random
priorities — md5 of (id, seed, round) is the deterministic stand-in, so
the output is a pure function of (graph, seed): reproducible across runs,
retries, and engines (the star-graph oracle replays the priority math in
SQL). Changing ``seed`` draws a different — equally valid — MIS.

Distributed plan per round: one join of the undecided-edge table against
the priority table + one algebraic ``min`` groupBy (neighbor minimum),
one comparison, two semi-joins to shrink the pool. No windows; edges are
re-derived by semi-join so the table shrinks monotonically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import PinnedGenerations, static_plans

_SEP = "\x1f"


def _prio(col: str, seed: int, rnd: int) -> F.Column:
    return F.md5(F.concat_ws(_SEP, F.col(col), F.lit(str(seed)), F.lit(str(rnd))))


def maximal_independent_set(
    graph: LinkGraph, seed: int = 0, max_iter: int = 200
) -> DataFrame:
    """DataFrame[id] — a maximal independent set: no two members adjacent,
    every non-member adjacent to a member. Deterministic in (graph, seed).
    Self-loops are ignored (a self-adjacent node can still be independent
    of OTHERS, matching networkx ``maximal_independent_set`` on simple
    projections). Directionality is ignored: independence is symmetric, so
    edges are symmetrized up front on directed graphs.

    Luby's round count is O(log n) with high probability; ``max_iter``
    exhaustion raises (an engine bug, not a data property).
    """
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        e = graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
        if graph.is_directed:
            e = e.unionByName(
                e.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
        gens = PinnedGenerations()
        edges = gens.pin(
            e.filter(F.col("u") != F.col("v"))
            .distinct()
            .repartition(npart, "u")
        )
        undecided = graph.nodes.select(ID).localCheckpoint(eager=True)
        chosen: DataFrame | None = None
        for rnd in range(max_iter):
            if undecided.isEmpty():
                break
            # isolated-in-pool nodes (no undecided neighbor) join outright:
            # min over an empty neighbor set is NULL below, handled by the
            # coalesce to the maximal hex string
            pri = undecided.select(ID, _prio(ID, seed, rnd).alias("p"))
            nbr_min = (
                edges.join(
                    pri.select(F.col(ID).alias("u"), F.col("p").alias("pu")), "u"
                )
                .join(pri.select(F.col(ID).alias("v")), "v", "left_semi")
                .groupBy("v")
                .agg(F.min("pu").alias("nmin"))
            )
            winners = (
                pri.join(nbr_min, pri[ID] == nbr_min["v"], "left")
                .filter(F.col("p") < F.coalesce("nmin", F.lit("g")))
                .select(ID)
                .localCheckpoint(eager=True)
            )
            chosen = winners if chosen is None else chosen.unionByName(winners)
            chosen = chosen.localCheckpoint(eager=False)
            # remove winners and their neighbors from the pool
            killed = winners.unionByName(
                edges.join(
                    winners.select(F.col(ID).alias("u")), "u", "left_semi"
                ).select(F.col("v").alias(ID))
            )
            undecided = (
                undecided.join(killed, ID, "left_anti")
                .localCheckpoint(eager=True)
            )
            edges = gens.pin(
                edges.join(undecided.select(F.col(ID).alias("u")), "u", "left_semi")
                .join(undecided.select(F.col(ID).alias("v")), "v", "left_semi")
                .repartition(npart, "u")
            )
        else:
            gens.release()
            raise RuntimeError(
                f"maximal_independent_set did not converge in max_iter="
                f"{max_iter} rounds — Luby needs O(log n) whp; this "
                "indicates an engine bug"
            )
        gens.release()
    if chosen is None:
        return spark.createDataFrame([], graph.nodes.select(ID).schema)
    return chosen.select(ID)


def greedy_coloring(
    graph: LinkGraph, seed: int = 0, max_colors: int = 64
) -> DataFrame:
    """DataFrame[id, color] — proper vertex coloring by repeated MIS: color
    k is a maximal independent set of the subgraph still uncolored (seed
    namespace ``seed + k``), so adjacent nodes never share a color and
    every node is colored. Deterministic in (graph, seed); color count is
    bounded by O(Δ) in the worst case — ``max_colors`` exhaustion raises
    rather than looping (raise it for high-degree graphs).

    Self-loops are ignored (consistent with :func:`maximal_independent_set`
    — a self-loop makes proper coloring undefined otherwise)."""
    spark = graph.edges.sparkSession
    e = graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
    remaining = graph.nodes.select(ID).localCheckpoint(eager=True)
    out: DataFrame | None = None
    for k in range(max_colors):
        if remaining.isEmpty():
            break
        sub_edges = e.join(
            remaining.select(F.col(ID).alias("u")), "u", "left_semi"
        ).join(remaining.select(F.col(ID).alias("v")), "v", "left_semi")
        sub = LinkGraph(
            sub_edges.select(F.col("u").alias(SRC), F.col("v").alias(DST)),
            nodes=remaining,
            keys={"directed": graph.is_directed},
        )
        mis = maximal_independent_set(sub, seed=seed + k)
        colored = mis.select(ID, F.lit(k).alias("color"))
        out = colored if out is None else out.unionByName(colored)
        out = out.localCheckpoint(eager=False)
        remaining = remaining.join(mis, ID, "left_anti").localCheckpoint(
            eager=True
        )
    else:
        raise RuntimeError(
            f"greedy_coloring exceeded max_colors={max_colors}; the graph's "
            "degeneracy is higher than the budget — raise max_colors"
        )
    if out is None:
        t = graph.nodes.schema[ID].dataType.simpleString()
        return spark.createDataFrame([], f"{ID} {t}, color int")
    return out
