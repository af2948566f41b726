"""Graph profile — one-row structural summary composing the engine's
existing primitives (degrees, CC, degree-oriented triangle pipeline).

The profile a data engineer pulls before running anything heavier: sizes,
density, component structure, clustering. Each number reuses the scale path
of its owning operator (the triangle terms share ONE oriented-edge build;
components is the distributed two-star loop), so the profile inherits their
100-TB properties instead of re-deriving anything. NOT in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.algorithms.components import connected_components
from linkgraph.algorithms.triangles import (
    _canonical_undirected,
    _degrees_of,
    _orient,
    _triples_of,
)
from linkgraph.graph import DST, ID, SRC, LinkGraph


def graph_profile(graph: LinkGraph) -> DataFrame:
    """One row: n_nodes, n_edges (distinct directed), n_edges_undirected
    (canonical simple), density_millionths (undirected simple, 0 for n<2),
    n_components, largest_component, n_triangles, transitivity_millionths,
    max_degree, avg_degree_millionths (mean simple undirected degree over
    ALL nodes, isolated included)."""
    n_nodes = graph.number_of_nodes()
    n_edges = graph.edges.select(SRC, DST).distinct().count()

    und = _canonical_undirected(graph).persist()
    deg = _degrees_of(und).persist()
    try:
        m_und = und.count()
        tri = _triples_of(_orient(und, deg)).count()
        drow = deg.agg(
            F.max("deg").alias("mx"),
            F.sum("deg").alias("sm"),
            # wedge term for transitivity; decimal: hub-safe like transitivity()
            F.sum(
                F.col("deg").cast("decimal(38,0)") * (F.col("deg") - 1)
            ).alias("w2"),
        ).collect()[0]
    finally:
        deg.unpersist()
        und.unpersist()
    max_degree = int(drow["mx"] or 0)
    wedges = int(drow["w2"] or 0) // 2
    sum_deg = int(drow["sm"] or 0)

    cc = connected_components(graph, with_sizes=True)
    crow = cc.agg(
        F.countDistinct("component").alias("nc"),
        F.max("component_size").alias("lc"),
    ).collect()[0]

    density = (
        2.0 * m_und / (n_nodes * (n_nodes - 1)) if n_nodes >= 2 else 0.0
    )
    transitivity = (3.0 * tri / wedges) if wedges else 0.0
    avg_degree = sum_deg / n_nodes if n_nodes else 0.0

    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [
            (
                n_nodes,
                n_edges,
                m_und,
                int(round(density * 1e6)),
                int(crow["nc"] or 0),
                int(crow["lc"] or 0),
                tri,
                int(round(transitivity * 1e6)),
                max_degree,
                int(round(avg_degree * 1e6)),
            )
        ],
        "n_nodes long, n_edges long, n_edges_undirected long, "
        "density_millionths long, n_components long, largest_component long, "
        "n_triangles long, transitivity_millionths long, max_degree long, "
        "avg_degree_millionths long",
    )


def degree_distribution(graph: LinkGraph) -> DataFrame:
    """DataFrame[degree, n_nodes, ccdf] — the undirected simple-degree
    histogram with complementary CDF ccdf = P(D >= degree), isolated nodes
    included at degree 0. The web-graph sanity plot (log-log ccdf) and the
    input to :func:`powerlaw_alpha`.

    Scale shape: one algebraic degree aggregate + one histogram groupBy;
    the suffix-sum window runs over DISTINCT degrees only — a metadata-
    sized table (the rich-club rationale, assortativity.py), never nodes
    or edges."""
    from pyspark.sql import Window

    und = _canonical_undirected(graph)
    deg = (
        graph.nodes.select(ID)
        .join(_degrees_of(und), ID, "left")
        .select(F.coalesce("deg", F.lit(0)).cast("long").alias("degree"))
    )
    n_total = graph.number_of_nodes()
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    w = Window.orderBy(F.desc("degree")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "degree",
        "n_nodes",
        (F.sum("n_nodes").over(w).cast("double") / F.lit(float(n_total))).alias(
            "ccdf"
        ),
    )
