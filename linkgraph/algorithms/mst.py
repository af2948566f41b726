"""Minimum spanning forest — distributed Borůvka over DataFrame supersteps.

NOT present in the reference (no spanning-tree utilities anywhere in
``mercury/graph``); added because MST is the canonical weighted-graph
reduction (network design, single-linkage clustering, dedup-cluster
backbones) and Borůvka is THE distributed formulation: every component
picks its minimum outgoing edge in one algebraic aggregate, components at
least halve per round, so the outer loop is O(log V) rounds at any scale.

Distributed plan per round:

1. label both endpoints of each canonical edge with their current
   component (two joins against the label table),
2. keep cross-component edges; each component picks
   ``min(struct(w, a, b))`` over its incident cross edges — an algebraic
   groupBy aggregate, no window, no sort,
3. the distinct picked edges join the forest; the picked
   (comp_a, comp_b) pairs are contracted with the engine's own
   :func:`linkgraph.algorithms.components.connected_components`
   (auto-gated: driver-local numpy under the threshold, two-star above),
   and labels are re-mapped through the contraction.

Correctness of step 2 without distinct weights: picks minimize the TOTAL
order ``(w, a, b)``, so following picks around any would-be cycle forces a
strictly decreasing sequence — impossible. The pick set is therefore a
forest after deduplication, the same argument networkx's Borůvka variant
relies on (it tie-breaks on edge indices).

Parallel edges take the minimum weight (canonical groupBy up front), so
MultiGraph inputs behave like networkx's ``minimum_spanning_edges`` on the
min-weight simple projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


def minimum_spanning_forest(graph: LinkGraph, max_iter: int = 64) -> DataFrame:
    """DataFrame[src, dst, weight] — the edges of a minimum spanning forest
    (one tree per connected component; ``src < dst`` canonical order).

    Deterministic: equal-weight ties break on the canonical ``(src, dst)``
    key, so the returned edge SET is stable run-to-run (networkx guarantees
    only the total weight under ties). Undirected graphs only — an MST of a
    directed graph is an arborescence, a different algorithm (raises
    ``ValueError``, same contract as ``topological_layers`` in reverse).

    ``max_iter`` bounds Borůvka rounds; components at least halve per round
    so 64 covers any graph below 2^64 nodes — hitting it means a logic
    error, reported loudly rather than looping.
    """
    if graph.is_directed:
        raise ValueError(
            "minimum_spanning_forest requires an undirected graph "
            "(directed spanning is an arborescence problem)"
        )
    from linkgraph.algorithms.components import connected_components

    spark = graph.edges.sparkSession
    with static_plans(spark):
        # canonical simple edges a < b (parallel edges -> min weight),
        # carrying their endpoints' CURRENT component labels as columns
        # (ca, cb) — contraction relabels the EDGE rows through the
        # pick-sized mapping instead of re-joining the full edge table
        # against a node-sized label table every round. Intra-component
        # edges are dropped as soon as their endpoints merge, so the
        # working set SHRINKS monotonically; the former label-table plan
        # re-scanned and re-exchanged the full edge set in every one of
        # the O(log V) rounds.
        cross = (
            graph.edges.select(
                F.least(SRC, DST).alias("a"),
                F.greatest(SRC, DST).alias("b"),
                graph.weight_col().alias("w"),
            )
            .filter(F.col("a") != F.col("b"))  # self-loops never span
            .groupBy("a", "b")
            .agg(F.min("w").alias("w"))
            .select(
                "w", "a", "b", F.col("a").alias("ca"), F.col("b").alias("cb")
            )
            .localCheckpoint(eager=False)
        )
        forest: DataFrame | None = None
        for _ in range(max_iter):
            # one algebraic min per component over its incident cross edges;
            # struct order (w, a, b) is the total order that makes the pick
            # set acyclic (module docstring)
            pick_struct = F.struct("w", "a", "b", "ca", "cb").alias("e")
            picks = (
                cross.select(F.col("ca").alias("comp"), pick_struct)
                .unionByName(cross.select(F.col("cb").alias("comp"), pick_struct))
                .groupBy("comp")
                .agg(F.min("e").alias("e"))
                .select("e.w", "e.a", "e.b", "e.ca", "e.cb")
                .localCheckpoint(eager=True)  # also materializes `cross`
            )
            if picks.isEmpty():
                break
            chosen = picks.select("a", "b", "w").distinct()
            forest = chosen if forest is None else forest.unionByName(chosen)
            forest = forest.localCheckpoint(eager=False)
            # contract: CC over the picked component pairs (<= one pick per
            # component, so this graph halves the component count); reuse
            # the engine's auto-gated solver rather than a bespoke loop.
            # The mapping is pick-sized — under the local gate it comes back
            # as a LocalRelation and BROADCASTS into both relabel joins, so
            # no round shuffles anything edge-sized at all.
            cg = LinkGraph(
                picks.select(F.col("ca").alias(SRC), F.col("cb").alias(DST)),
                keys={"directed": False},
            )
            mapping = connected_components(cg, with_sizes=False)
            ma = mapping.select(
                F.col(ID).alias("ca"), F.col("component").alias("_na")
            )
            mb = mapping.select(
                F.col(ID).alias("cb"), F.col("component").alias("_nb")
            )
            cross = (
                cross.join(ma, "ca", "left")
                .join(mb, "cb", "left")
                .select(
                    "w",
                    "a",
                    "b",
                    F.coalesce("_na", "ca").alias("ca"),
                    F.coalesce("_nb", "cb").alias("cb"),
                )
                .filter(F.col("ca") != F.col("cb"))
                .localCheckpoint(eager=False)
            )
        else:
            raise RuntimeError(
                f"minimum_spanning_forest did not contract within max_iter="
                f"{max_iter} rounds — components must at least halve per "
                "round; this indicates an engine bug"
            )
    if forest is None:
        # edge-free (or all-self-loop) graph: empty forest, typed to the
        # graph's node id type
        t = graph.nodes.schema[ID].dataType.simpleString()
        return spark.createDataFrame([], f"{SRC} {t}, {DST} {t}, weight double")
    return forest.select(
        F.col("a").alias(SRC), F.col("b").alias(DST), F.col("w").alias("weight")
    )


def minimum_spanning_weight(graph: LinkGraph) -> float:
    """Total weight of the minimum spanning forest (0.0 for edge-free
    graphs) — the scalar most pipelines actually want."""
    row = minimum_spanning_forest(graph).agg(F.sum("weight")).first()
    return float(row[0]) if row[0] is not None else 0.0
