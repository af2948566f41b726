"""SALSA — Stochastic Approach for Link-Structure Analysis (Lempel & Moran,
WWW'00): hub and authority scores from the stationary distributions of the
two-step alternating random walks on the directed link graph.

The classic result makes this iteration-free: the authority chain's
stationary distribution is proportional to IN-degree within each connected
component of the chain's support graph, weighted by the component's share
of authorities; dually for hubs with OUT-degree. The support components are
NOT the undirected components of the original graph — a node plays separate
hub and authority roles (on the chain x→h→a, authorities {h} and {a} are in
different chain components even though the underlying graph is connected).
They are exactly the components of the role-split bipartite graph
(hub-copy u)—(authority-copy v) per edge u→v, so ONE run of the engine's
existing distributed CC on that 2V/E graph yields both partitions, and the
scores follow from two degree aggregates + per-component sums — no power
iteration, no convergence knob:

    authority(a) = (|A_c| / |A|) · d_in(a)  / Σ_{a'∈c} d_in(a')
    hub(h)       = (|H_c| / |H|) · d_out(h) / Σ_{h'∈c} d_out(h')

where c is the node's role-component, A/H the authority (hub) node sets.
Each score vector sums to 1 over the graph. NOT in the reference (no SALSA
under ``mercury/``); tests cross-check against the explicitly-built Markov
chain's stationary vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.algorithms.components import connected_components
from linkgraph.graph import DST, ID, SRC, LinkGraph

_H = "\x01H"
_A = "\x01A"


def salsa(graph: LinkGraph, **cc_kwargs) -> DataFrame:
    """DataFrame[id, hub_score, authority_score] for every node; nodes with
    no out-edges (in-edges) score 0.0 as hubs (authorities)."""
    e = graph.edges.select(SRC, DST).distinct().persist()
    try:
        cover = e.select(
            F.concat(F.col(SRC), F.lit(_H)).alias("src"),
            F.concat(F.col(DST), F.lit(_A)).alias("dst"),
        )
        labels = connected_components(
            LinkGraph(cover), with_sizes=False, **cc_kwargs
        )
        split = F.split(F.col(ID), "\x01")
        labels = labels.select(
            split.getItem(0).alias(ID),
            split.getItem(1).alias("role"),
            "component",
        )
        h_lab = labels.filter(F.col("role") == "H").select(ID, "component")
        a_lab = labels.filter(F.col("role") == "A").select(ID, "component")

        d_in = e.groupBy(F.col(DST).alias(ID)).agg(
            F.count(F.lit(1)).alias("d_in")
        )
        d_out = e.groupBy(F.col(SRC).alias(ID)).agg(
            F.count(F.lit(1)).alias("d_out")
        )

        auth = d_in.join(a_lab, ID)
        hub = d_out.join(h_lab, ID)

        a_tot = auth.count()
        h_tot = hub.count()

        a_comp = auth.groupBy("component").agg(
            F.count(F.lit(1)).alias("n_a"), F.sum("d_in").alias("s_in")
        )
        h_comp = hub.groupBy("component").agg(
            F.count(F.lit(1)).alias("n_h"), F.sum("d_out").alias("s_out")
        )

        a_sc = auth.join(a_comp, "component").select(
            ID,
            (
                (F.col("n_a") / F.lit(float(a_tot)))
                * F.col("d_in")
                / F.col("s_in")
            ).alias("authority_score"),
        )
        h_sc = hub.join(h_comp, "component").select(
            ID,
            (
                (F.col("n_h") / F.lit(float(h_tot)))
                * F.col("d_out")
                / F.col("s_out")
            ).alias("hub_score"),
        )

        out = (
            graph.nodes.select(ID)
            .join(h_sc, ID, "left")
            .join(a_sc, ID, "left")
            .select(
                ID,
                F.coalesce("hub_score", F.lit(0.0)).alias("hub_score"),
                F.coalesce("authority_score", F.lit(0.0)).alias(
                    "authority_score"
                ),
            )
        )
        out = out.localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return out
