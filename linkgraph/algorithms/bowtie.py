"""Bow-tie decomposition of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000 — public).

THE classic macroscopic web-graph analysis: every node is assigned to one
region relative to the largest strongly connected component —

    CORE          the largest SCC
    IN            reaches CORE (but not in it)
    OUT           reachable from CORE (but not in it)
    TUBE          on an IN→OUT path that avoids CORE
    TENDRIL       reachable from IN, or reaching OUT, but none of the above
    OTHER         weakly attached to the structure in any remaining way
                  (e.g. pointing INTO a tendril — Broder's taxonomy leaves
                  these unnamed; they are labeled explicitly here rather
                  than silently folded into TENDRIL)
    DISCONNECTED  not even weakly connected to CORE

Built entirely from the engine's existing primitives: the distributed SCC
(largest component = CORE), the undirected CC (weak attachment), and a
frontier-pruned multi-source reachability loop (one semi-join + anti-join
per BFS round, rounds = graph diameter). The set algebra is joins — no
driver-side membership structures.

A classic sanity anchor: on the 2000 web crawl all four big regions
(CORE/IN/OUT/TENDRILS) were comparably sized — if a "web-shaped" graph
comes back 99% CORE, the crawl's edge direction is probably inverted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.algorithms.components import connected_components
from linkgraph.algorithms.scc import strongly_connected_components
from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def _reach(edges: DataFrame, seeds: DataFrame, max_iter: int) -> DataFrame:
    """Nodes reachable FROM ``seeds`` along ``edges`` (u → v), seeds
    included. Frontier BFS: per round one frontier join + one anti-join
    against the settled set; early exit on an empty frontier."""
    settled = seeds.select(ID).distinct().localCheckpoint(eager=True)
    frontier = settled
    for _ in range(max_iter):
        nxt = (
            frontier.join(edges, frontier[ID] == edges["u"])
            .select(F.col("v").alias(ID))
            .distinct()
            .join(settled, ID, "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return settled


def bowtie_decomposition(graph: LinkGraph, max_iter: int = 200) -> DataFrame:
    """DataFrame[id, region] with region in {CORE, IN, OUT, TUBE, TENDRIL,
    OTHER, DISCONNECTED} — each node's place in the Broder bow-tie around
    the LARGEST SCC (ties broken by minimum component label)."""
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        edges = pin_partitioned(
            graph.edges.select(
                F.col(SRC).alias("u"), F.col(DST).alias("v")
            )
            .distinct()
            .repartition(npart, "u")
        )
        redges = pin_partitioned(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
            .repartition(npart, "u")
        )
        try:
            scc = strongly_connected_components(graph, with_sizes=True)
            top = (
                scc.groupBy("scc")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), F.asc("scc"))
                .limit(1)
                .collect()[0]["scc"]
            )
            core = scc.filter(F.col("scc") == top).select(ID).localCheckpoint(
                eager=True
            )
            fwd = _reach(edges, core, max_iter)       # CORE ∪ OUT
            bwd = _reach(redges, core, max_iter)      # CORE ∪ IN
            out_ = fwd.join(core, ID, "left_anti")
            in_ = bwd.join(core, ID, "left_anti")
            nodes = graph.nodes.select(ID)
            rest = (
                nodes.join(fwd, ID, "left_anti")
                .join(bwd, ID, "left_anti")
                .localCheckpoint(eager=True)
            )
            # any path from IN into `rest` cannot touch CORE (that would
            # make the node OUT), so plain reachability == core-avoiding
            from_in = _reach(edges, in_, max_iter).join(rest, ID, "left_semi")
            to_out = _reach(redges, out_, max_iter).join(rest, ID, "left_semi")
            tube = from_in.join(to_out, ID, "left_semi")
            tendril = (
                from_in.unionByName(to_out)
                .distinct()
                .join(tube, ID, "left_anti")
            )
            # nodes= is load-bearing: without it an ISOLATED largest SCC
            # (a singleton core with no incident edge, possible under the
            # min-label tiebreak) has no wcc row and the collect below
            # would IndexError (ADVICE r4). With it, isolated nodes get
            # their own singleton component.
            wcc = connected_components(
                LinkGraph(
                    graph.edges.select(SRC, DST),
                    nodes=graph.nodes.select(ID),
                    keys={"directed": False},
                ),
                with_sizes=False,
            )
            core_row = wcc.join(core, ID, "left_semi").limit(1).collect()
            if core_row:
                core_wcc = core_row[0]["component"]
                attached = wcc.filter(
                    F.col("component") == core_wcc
                ).select(ID)
            else:  # pragma: no cover - defense in depth behind nodes= fix
                attached = core.select(ID)
            labeled = (
                core.select(ID, F.lit("CORE").alias("region"))
                .unionByName(in_.select(ID, F.lit("IN").alias("region")))
                .unionByName(out_.select(ID, F.lit("OUT").alias("region")))
                .unionByName(tube.select(ID, F.lit("TUBE").alias("region")))
                .unionByName(
                    tendril.select(ID, F.lit("TENDRIL").alias("region"))
                )
            )
            remainder = nodes.join(labeled.select(ID), ID, "left_anti")
            other = remainder.join(attached, ID, "left_semi").select(
                ID, F.lit("OTHER").alias("region")
            )
            disc = remainder.join(attached, ID, "left_anti").select(
                ID, F.lit("DISCONNECTED").alias("region")
            )
            return (
                labeled.unionByName(other)
                .unionByName(disc)
                .localCheckpoint(eager=True)
            )
        finally:
            edges.unpersist()
            redges.unpersist()
