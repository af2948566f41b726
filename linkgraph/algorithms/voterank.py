"""VoteRank influential-spreader selection (Zhang et al. 2016).

NOT present in the reference (its centralities stop at closeness /
betweenness / pagerank, ``mercury/graph/core/graph.py:627-690``); added
because "pick k seed nodes for an influence campaign" is the question
degree/pagerank rankings answer badly — VoteRank's vote-then-weaken loop
suppresses seeds that share an audience. Semantics match
``networkx.voterank``: every node starts with voting ability 1; each
round every node's score is the summed ability of its out-neighbors
(undirected graphs hold both edge directions, so this is the full
neighborhood), the top scorer is elected (never re-electable), its own
ability zeroes, and each of its out-neighbors loses 1/⟨k_out⟩ ability
(floored at 0). Ties break by ascending id — networkx leaves ties to
dict order, so parity tests use tie-free graphs.

Distributed plan: the edge table stays put; each of the k rounds is one
broadcast ability join + one algebraic sum + a global top-1 (a scalar
collect, same budget class as a convergence check — k is user-small).
The ability update joins against the winner's (node-sized at worst)
neighbor set and lineage-truncates, so round r+1's plan does not grow
with r. No windows, no Python eval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


def voterank(graph: LinkGraph, k: int = 10) -> DataFrame:
    """Top-``k`` influential spreaders: DataFrame [rank, id, score] in
    election order. Stops early (fewer rows) when the best remaining
    score hits 0 — matching networkx. ``score`` is the winning vote sum
    at election time."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = graph.edges.sparkSession
    id_type = dict(graph.nodes.dtypes)[ID]
    ddl = f"rank int, id {id_type}, score double"
    edges = graph.edges.select(SRC, DST).distinct().persist()
    try:
        n = graph.nodes.count()
        m = edges.count()  # = Σ out-degrees
        if n == 0 or m == 0:
            return spark.createDataFrame([], ddl)
        # replicate networkx op order: delta = 1 / (Σdeg / n)
        delta = 1.0 / (m / n)
        abilities = graph.nodes.select(F.col(ID), F.lit(1.0).alias("_a"))
        elected: list[tuple[int, object, float]] = []
        for rnd in range(k):
            scores = (
                edges.join(
                    # build the node-sized ability table, stream the edges
                    abilities.select(F.col(ID).alias(DST), "_a").hint(
                        "shuffle_hash"
                    ),
                    DST,
                )
                .groupBy(SRC)
                .agg(F.sum("_a").alias("_score"))
            )
            if elected:
                scores = scores.filter(
                    ~F.col(SRC).isin([w for _, w, _ in elected])
                )
            top = (
                scores.orderBy(F.desc("_score"), F.asc(SRC)).limit(1).collect()
            )
            if not top or top[0]["_score"] <= 0:
                break
            winner, score = top[0][SRC], float(top[0]["_score"])
            elected.append((rnd + 1, winner, score))
            nbrs = (
                edges.filter(F.col(SRC) == F.lit(winner))
                .select(F.col(DST).alias(ID))
                .distinct()
                .withColumn("_hit", F.lit(1))
            )
            abilities = (
                abilities.join(nbrs, ID, "left")
                .select(
                    ID,
                    F.when(F.col(ID) == F.lit(winner), F.lit(0.0))
                    .when(
                        F.col("_hit").isNotNull(),
                        F.greatest(F.lit(0.0), F.col("_a") - F.lit(delta)),
                    )
                    .otherwise(F.col("_a"))
                    .alias("_a"),
                )
                .localCheckpoint(eager=True)
            )
        return spark.createDataFrame(elected, ddl)
    finally:
        edges.unpersist()
