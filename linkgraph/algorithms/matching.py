"""Maximal matching — deterministic local-minimum edge rounds.

NOT present in the reference (no matching utilities in ``mercury/graph``);
the edge-analog of :mod:`linkgraph.algorithms.mis`: pairing workloads
(dedup record linking, one-to-one assignment seeds, graph coarsening for
multilevel partitioning) need a conflict-free edge set, computed without
coordination.

An edge joins the matching when its md5 priority is the minimum among ALL
edges sharing an endpoint with it — checked as "equal to BOTH endpoints'
incident minimum", one algebraic min-groupBy per endpoint side and one
join, no windows. Matched nodes and every edge touching them leave the
pool; like Luby, a constant fraction of edges dies per round in
expectation, so rounds are O(log m) whp, and the output is a pure
function of (graph, seed) — reproducible and engine-replayable (the
star-graph oracle recomputes round 1 in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import PinnedGenerations, static_plans

_SEP = "\x1f"


def maximal_matching(
    graph: LinkGraph, seed: int = 0, max_iter: int = 200
) -> DataFrame:
    """DataFrame[src, dst] — a maximal matching over the canonical simple
    edge set (``src < dst``): no two output edges share an endpoint, and
    every input edge shares an endpoint with an output edge. Deterministic
    in (graph, seed); self-loops can never match and are dropped."""
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        # pinned generations: each round's survivor set materializes from
        # the previous generation's cache, keeping hash(a) visible so the
        # per-round joins never re-exchange the edge side
        gens = PinnedGenerations()
        edges = gens.pin(
            graph.edges.select(
                F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .repartition(npart, "a")
        )
        matched: DataFrame | None = None
        for rnd in range(max_iter):
            if edges.isEmpty():
                break
            pri = edges.select(
                "a",
                "b",
                F.md5(
                    F.concat_ws(
                        _SEP, F.col("a"), F.col("b"), F.lit(str(seed)),
                        F.lit(str(rnd)),
                    )
                ).alias("p"),
            ).localCheckpoint(eager=True)
            ends = pri.select(F.col("a").alias("n"), "p").unionByName(
                pri.select(F.col("b").alias("n"), "p")
            )
            nmin = ends.groupBy("n").agg(F.min("p").alias("pmin"))
            winners = (
                pri.join(
                    nmin.select(F.col("n").alias("a"), F.col("pmin").alias("ma")),
                    "a",
                )
                .join(
                    nmin.select(F.col("n").alias("b"), F.col("pmin").alias("mb")),
                    "b",
                )
                .filter((F.col("p") == F.col("ma")) & (F.col("p") == F.col("mb")))
                .select("a", "b")
                .localCheckpoint(eager=True)
            )
            matched = winners if matched is None else matched.unionByName(winners)
            matched = matched.localCheckpoint(eager=False)
            used = winners.select(F.col("a").alias("n")).unionByName(
                winners.select(F.col("b").alias("n"))
            )
            edges = gens.pin(
                edges.join(used.withColumnRenamed("n", "a"), "a", "left_anti")
                .join(used.withColumnRenamed("n", "b"), "b", "left_anti")
                .repartition(npart, "a")
            )
        else:
            gens.release()
            raise RuntimeError(
                f"maximal_matching did not converge in max_iter={max_iter} "
                "rounds — expected O(log m) whp; this indicates an engine bug"
            )
        gens.release()
    if matched is None:
        t = graph.nodes.schema[ID].dataType.simpleString()
        return spark.createDataFrame([], f"{SRC} {t}, {DST} {t}")
    return matched.select(F.col("a").alias(SRC), F.col("b").alias(DST))
