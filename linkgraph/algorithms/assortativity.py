"""Degree assortativity coefficient — Pearson correlation of endpoint
degrees over the edge list (Newman, "Assortative mixing in networks", 2002).

NOT present in the reference (no mixing/correlation code under
``mercury/``); added as a one-pass structural summary a graph engine at
100 TB should provide: two algebraic degree aggregates, one join of the
edge list against the (node-sized, broadcastable) degree table per
endpoint, and a single ``corr`` aggregate — no window, no iteration, no
driver-side rows.

Semantics match ``networkx.degree_assortativity_coefficient``:
- undirected: every edge contributes BOTH (deg(u), deg(v)) and
  (deg(v), deg(u)) pairs (the symmetrized edge list the LinkGraph already
  materializes), so the correlation is symmetric by construction;
- directed: pairs are (out_degree(u), in_degree(v)) over the directed
  edges — networkx's default ``x='out', y='in'``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph import DST, SRC, LinkGraph


def degree_assortativity(graph: LinkGraph) -> float:
    """Pearson degree-degree correlation over edges; NaN on degenerate
    inputs (no edges, or zero degree variance) exactly like networkx.

    Edges are canonicalized first — parallel edges collapsed, self-loops
    dropped — so a weighted multigraph input measures the same simple-graph
    statistic networkx computes on its collapsed Graph/DiGraph (networkx's
    own self-loop handling counts a loop twice in the degree; this engine
    follows its triangle/clustering convention and ignores loops)."""
    edges = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    if graph.is_directed:
        dout = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("dx"))
        din = (
            edges.groupBy(DST).agg(F.count(F.lit(1)).alias("dy"))
        )
        pairs = (
            edges.join(dout, SRC)
            .join(din, DST)
            .select("dx", "dy")
        )
    else:
        # LinkGraph materializes undirected edges as src↔dst both ways, so
        # the degree table and the pair list are already symmetric
        deg = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("d"))
        pairs = (
            edges.join(deg.select(F.col(SRC).alias("_u"), F.col("d").alias("dx")),
                       edges[SRC] == F.col("_u"))
            .join(deg.select(F.col(SRC).alias("_v"), F.col("d").alias("dy")),
                  edges[DST] == F.col("_v"))
            .select("dx", "dy")
        )
    try:
        row = pairs.agg(F.corr("dx", "dy").alias("r")).collect()[0]
    except Exception as e:  # ANSI mode: zero degree variance → DIVIDE_BY_ZERO
        if "DIVIDE_BY_ZERO" in str(e):
            return float("nan")
        raise
    return float("nan") if row["r"] is None else float(row["r"])
