"""Densest subgraph — greedy (2+2ε)-approximation by threshold peeling.

NOT in the reference; the standard dense-core extractor (fraud rings,
spam link farms, community nuclei). Algorithm of Bahmani-Kumar-Vassilvitskii
(VLDB'12), built for exactly this execution model: repeatedly delete every
node whose degree is ≤ (1+ε)·(current average density), remember the
iterate with the best density seen; O(log_{1+ε} n) rounds, each one
algebraic degree aggregate + two semi-joins — no windows, no driver-side
graph state beyond two scalars per round.

Density here is the standard |E|/|V| of the induced subgraph (undirected
simple graph; both-direction storage is canonicalized first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import ID, LinkGraph
from linkgraph.session import static_plans


def densest_subgraph(
    graph: LinkGraph,
    epsilon: float = 0.5,
    max_iter: int = 100,
) -> tuple[DataFrame, float]:
    """(nodes, density) — the node set of the best-density iterate of the
    peeling sequence and its |E|/|V| density; a (2+2ε)-approximation of
    the optimum. Larger ``epsilon`` peels faster (fewer rounds) at a
    looser guarantee."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    with static_plans(graph.edges.sparkSession):
        from linkgraph.algorithms.triangles import (
            _canonical_undirected,
            _degrees_of,
        )

        edges = _canonical_undirected(graph).localCheckpoint(eager=True)
        best_nodes: DataFrame | None = None
        best_density = -1.0
        # max_iter + 1: a peel that empties the graph on round k only
        # OBSERVES the empty edge set on round k+1, and that final check
        # round is free (one count on an empty table), so the documented
        # O(log n) bound stays the peel-round bound
        for _ in range(max_iter + 1):
            deg = _degrees_of(edges).localCheckpoint(eager=False)
            stats = deg.agg(
                F.count(F.lit(1)).alias("v"), F.sum("deg").alias("d2")
            ).collect()[0]
            v = stats["v"] or 0
            if v == 0:
                break
            density = float(stats["d2"]) / 2.0 / v
            if density > best_density:
                best_density = density
                best_nodes = deg.select(ID).localCheckpoint(eager=True)
            # degree threshold 2(1+eps)*rho (avg degree = 2*density): every
            # round provably removes an eps/(1+eps) node fraction — a plain
            # (1+eps)*rho cut stalls forever on regular graphs (deg = 2*rho)
            thresh = 2.0 * (1.0 + epsilon) * density
            keep = deg.filter(F.col("deg") > thresh).select(ID)
            edges = (
                # shuffle_hash: build the node-sized keep set in both semi
                # joins, stream the edge table (guide §3.1)
                edges.join(
                    keep.withColumnRenamed(ID, "a").hint("shuffle_hash"),
                    "a",
                    "left_semi",
                )
                .join(
                    keep.withColumnRenamed(ID, "b").hint("shuffle_hash"),
                    "b",
                    "left_semi",
                )
                .localCheckpoint(eager=False)
            )
        else:
            raise RuntimeError(
                f"densest_subgraph did not finish within max_iter={max_iter} "
                "rounds (needs O(log n / log(1+epsilon)))"
            )
    if best_nodes is None:  # edge-free input
        spark = graph.edges.sparkSession
        return (
            spark.createDataFrame([], graph.nodes.select(ID).schema),
            0.0,
        )
    return best_nodes, best_density
