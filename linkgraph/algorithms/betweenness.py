"""Betweenness centrality — driver-local, explicitly size-guarded.

The reference is networkx-only here with the comment that the algorithm "is
too computationally expensive to use on large graphs"
(``mercury/graph/core/graph.py:673-679``); no distributed path exists in the
reference and none is pretended here (documented out of scale scope,
SURVEY.md A5). The graph is collected to the driver, Brandes' algorithm runs
in networkx (pure Python, no scipy needed), and the result returns as a
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from linkgraph.graph import DST, ID, SRC, LinkGraph


def betweenness_centrality(
    graph: LinkGraph, max_nodes: int = 50_000, normalized: bool = True
) -> DataFrame:
    n = graph.number_of_nodes()
    if n > max_nodes:
        raise ValueError(
            f"betweenness is driver-local (O(V*E)); graph has {n} nodes > "
            f"max_nodes={max_nodes}. Use pagerank/closeness at scale."
        )
    try:
        import networkx as nx
    except ImportError as e:  # pragma: no cover
        raise ImportError("betweenness_centrality requires networkx") from e

    g = nx.DiGraph() if graph.is_directed else nx.Graph()
    g.add_nodes_from(r[ID] for r in graph.nodes.select(ID).collect())
    w = graph.weight_col()
    for r in graph.edges.select(SRC, DST, w.alias("w")).collect():
        g.add_edge(r[SRC], r[DST], weight=r["w"])
    bc = nx.betweenness_centrality(g, normalized=normalized)
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(k, float(v)) for k, v in bc.items()], [ID, "betweenness"]
    )
