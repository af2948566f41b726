"""Visualization data export — the Moebius JSON payload shape.

The reference's Moebius class is a D3/JS notebook UI
(``mercury/graph/viz/moebius.py``); the UI itself is a documented non-goal
(SURVEY.md §8), but the JSON payload a viz frontend consumes
(``moebius.py:226-310`` ``_get_adjacent_nodes_moebius``) is engine surface:

    {"nodes": [{"id", "count", "_int_id", ...attrs}],
     "links": [{"source", "target", "_int_id"}]}

where ``count`` is the node's degree and ``_int_id`` is a unique integer per
node/edge (edge ``_int_id = int(source) + N·(int(target)+1)``,
moebius.py:330-334).

Deviation (scale-motivated): the reference builds a driver-side dict of ALL
node ids up front (``_int_id_map``, moebius.py:70-71) — O(V) driver memory.
Here the integer ids are assigned over the bounded ego payload only (sorted
for determinism), so the export works on graphs of any size: the only
driver-side data is the ≤``limit`` nodes being drawn.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


def moebius_json(
    graph: LinkGraph, node_id, depth: int = 1, limit: int = 20
) -> str:
    """JSON payload for expanding ``node_id`` in a Moebius-style viz: the
    depth-bounded ego subgraph with full-graph degree counts."""
    nodes_df, edges_df = graph.ego_subgraph(node_id, depth=depth, limit=limit)
    ids = nodes_df.select(ID).localCheckpoint(eager=True)  # ≤ limit rows
    # Full-graph degree counts for the payload nodes WITHOUT a full-graph
    # groupBy: broadcast-semi-join the endpoint stream against the ≤limit ego
    # ids first, so the aggregate only ever sees incident endpoint rows.
    ends = graph.edges.select(F.col(SRC).alias(ID)).union(
        graph.edges.select(F.col(DST).alias(ID))
    )
    deg = (
        ends.join(F.broadcast(ids), ID, "leftsemi")
        .groupBy(ID)
        .agg(F.count(F.lit(1)).alias("count"))
    )
    with_deg = nodes_df.join(deg, ID, "left")
    node_rows = sorted(
        ([r[ID], int(r["count"] or 0)] for r in with_deg.collect()),
        key=lambda t: str(t[0]),
    )
    int_id = {nid: i for i, (nid, _c) in enumerate(node_rows)}
    n = len(int_id)
    nodes = [
        {"id": nid, "count": c, "_int_id": int_id[nid]} for nid, c in node_rows
    ]
    links = [
        {
            "source": r[SRC],
            "target": r[DST],
            "_int_id": int_id[r[SRC]] + n * (int_id[r[DST]] + 1),
        }
        for r in edges_df.select(SRC, DST).distinct().collect()
        # an edge endpoint reached by BFS but absent from an explicit node
        # table has no node row to draw — drop the undrawable link instead
        # of KeyError-ing
        if r[SRC] in int_id and r[DST] in int_id
    ]
    links.sort(key=lambda d: d["_int_id"])
    return json.dumps({"nodes": nodes, "links": links}, ensure_ascii=False)
