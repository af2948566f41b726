"""Cut structure — bridges and articulation points (Tarjan/Hopcroft lowlink).

Driver-local by nature (a single DFS over the undirected simple graph) and
size-guarded exactly like betweenness — the reference keeps its own
expensive whole-graph analyses driver-local too
(``mercury/graph/core/graph.py:673-679``). Implemented as an ITERATIVE
lowlink DFS (no recursion limit, no networkx dependency); networkx is the
test oracle only.

At 100 TB, bridges have a genuinely distributed sibling:
:func:`linkgraph.algorithms.bridges.bridges` (spanning forest + XOR-tag
cut sketch — no DFS, no driver graph) — use that for whole-graph bridge
finding and keep this module for ARTICULATION POINTS, which still need the
DFS-tree lowlink argument, after CC extraction / k-core pruning shrinks
the component below the guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


def _collect_undirected(graph: LinkGraph, max_nodes: int, what: str):
    n = graph.number_of_nodes()
    if n > max_nodes:
        raise ValueError(
            f"{what} is driver-local (single-DFS); graph has {n} nodes > "
            f"max_nodes={max_nodes}. Extract components / k-core prune first."
        )
    und = (
        graph.edges.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .collect()
    )
    nodes = [r[ID] for r in graph.nodes.select(ID).collect()]
    adj: dict = {v: [] for v in nodes}
    for r in und:
        adj[r["a"]].append(r["b"])
        adj[r["b"]].append(r["a"])
    return nodes, adj


def _lowlink(nodes, adj):
    """Iterative lowlink DFS → (bridges, articulation points)."""
    disc: dict = {}
    low: dict = {}
    parent: dict = {}
    bridges = []
    arts = set()
    counter = 0
    for root in nodes:
        if root in disc:
            continue
        root_children = 0
        # stack entries: (node, iterator index over adj[node])
        disc[root] = low[root] = counter
        counter += 1
        stack = [(root, 0)]
        while stack:
            u, i = stack.pop()
            if i < len(adj[u]):
                stack.append((u, i + 1))
                v = adj[u][i]
                if v not in disc:
                    parent[v] = u
                    if u == root:
                        root_children += 1
                    disc[v] = low[v] = counter
                    counter += 1
                    stack.append((v, 0))
                elif v != parent.get(u):
                    low[u] = min(low[u], disc[v])
            else:
                # u is finished: fold its lowlink into the parent
                p = parent.get(u)
                if p is not None:
                    low[p] = min(low[p], low[u])
                    if low[u] > disc[p]:
                        bridges.append((min(p, u), max(p, u)))
                    if p != root and low[u] >= disc[p]:
                        arts.add(p)
        if root_children >= 2:
            arts.add(root)
    return bridges, arts


def bridges(graph: LinkGraph, max_nodes: int = 200_000) -> DataFrame:
    """DataFrame[src, dst] (canonical src < dst): edges whose removal
    disconnects their component — networkx ``bridges`` parity on the
    undirected simple view (direction and duplicates ignored)."""
    nodes, adj = _collect_undirected(graph, max_nodes, "bridges")
    bl, _ = _lowlink(nodes, adj)
    spark = graph.edges.sparkSession
    t = graph.nodes.schema[ID].dataType.simpleString()
    return spark.createDataFrame(sorted(bl), schema=f"{SRC} {t}, {DST} {t}")


def articulation_points(
    graph: LinkGraph, max_nodes: int = 200_000
) -> DataFrame:
    """DataFrame[id]: nodes whose removal disconnects their component —
    networkx ``articulation_points`` parity on the undirected simple
    view."""
    nodes, adj = _collect_undirected(graph, max_nodes, "articulation_points")
    _, arts = _lowlink(nodes, adj)
    spark = graph.edges.sparkSession
    t = graph.nodes.schema[ID].dataType.simpleString()
    return spark.createDataFrame([(v,) for v in sorted(arts)], schema=f"{ID} {t}")
