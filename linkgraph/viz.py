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


_MOEBIUS_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>${title}</title>
<style>
  body {{ margin: 0; font: 13px system-ui, sans-serif; background: #fafafa; }}
  #hdr {{ padding: 8px 12px; color: #444; }}
  svg {{ display: block; }}
  line {{ stroke: #b9c2cc; stroke-width: 1.2; }}
  circle {{ fill: #4878a8; stroke: #fff; stroke-width: 1; cursor: grab; }}
  text {{ fill: #333; pointer-events: none; }}
</style>
</head>
<body>
<div id="hdr">${title} &mdash; <span id="meta"></span></div>
<svg id="g" width="960" height="640"></svg>
<script id="payload" type="application/json">${payload}</script>
<script>
"use strict";
// Self-contained force layout (Fruchterman–Reingold with velocity damping,
// public textbook algorithm) — no external scripts, works offline.
var data = JSON.parse(document.getElementById("payload").textContent);
var svg = document.getElementById("g");
var W = 960, H = 640, NS = "http://www.w3.org/2000/svg";
document.getElementById("meta").textContent =
  data.nodes.length + " nodes, " + data.links.length + " links";
// deterministic seeded PRNG (mulberry32) so the same payload always draws
// the same picture
var s = 0x9e3779b9;
function rnd() {{
  s |= 0; s = (s + 0x6d2b79f5) | 0;
  var t = Math.imul(s ^ (s >>> 15), 1 | s);
  t = (t + Math.imul(t ^ (t >>> 7), 61 | t)) ^ t;
  return ((t ^ (t >>> 14)) >>> 0) / 4294967296;
}}
var byId = {{}};
data.nodes.forEach(function (n) {{
  n.x = W / 2 + (rnd() - 0.5) * W * 0.6;
  n.y = H / 2 + (rnd() - 0.5) * H * 0.6;
  n.vx = 0; n.vy = 0;
  n.r = 5 + 3 * Math.sqrt(Math.max(n.count, 1));
  byId[n.id] = n;
}});
var links = data.links.filter(function (l) {{
  return byId[l.source] && byId[l.target];
}});
var k = Math.sqrt((W * H) / Math.max(data.nodes.length, 1));
function step(temp) {{
  var i, j, a, b, dx, dy, d2, d, f;
  for (i = 0; i < data.nodes.length; i++) {{
    a = data.nodes[i];
    for (j = i + 1; j < data.nodes.length; j++) {{
      b = data.nodes[j];
      dx = a.x - b.x; dy = a.y - b.y;
      d2 = dx * dx + dy * dy + 0.01;
      f = (k * k) / d2;                       // repulsion
      a.vx += dx * f; a.vy += dy * f;
      b.vx -= dx * f; b.vy -= dy * f;
    }}
  }}
  links.forEach(function (l) {{
    a = byId[l.source]; b = byId[l.target];
    dx = b.x - a.x; dy = b.y - a.y;
    d = Math.sqrt(dx * dx + dy * dy) + 0.01;
    f = (d * d) / k / d / 8;                  // attraction along edges
    a.vx += dx * f; a.vy += dy * f;
    b.vx -= dx * f; b.vy -= dy * f;
  }});
  data.nodes.forEach(function (n) {{
    var v = Math.sqrt(n.vx * n.vx + n.vy * n.vy) + 1e-9;
    var lim = Math.min(v, temp);
    n.x += (n.vx / v) * lim; n.y += (n.vy / v) * lim;
    n.x = Math.max(20, Math.min(W - 20, n.x));
    n.y = Math.max(20, Math.min(H - 20, n.y));
    n.vx = 0; n.vy = 0;
  }});
}}
for (var it = 0; it < 300; it++) step(10 * (1 - it / 300) + 0.5);
var lineEls = links.map(function (l) {{
  var e = document.createElementNS(NS, "line");
  svg.appendChild(e); return e;
}});
var nodeEls = data.nodes.map(function (n) {{
  var c = document.createElementNS(NS, "circle");
  c.setAttribute("r", n.r);
  var t = document.createElementNS(NS, "title");
  t.textContent = n.id + " (degree " + n.count + ")";
  c.appendChild(t);
  svg.appendChild(c);
  var lbl = document.createElementNS(NS, "text");
  lbl.textContent = n.id;
  svg.appendChild(lbl);
  n._el = c; n._lbl = lbl;
  return c;
}});
function draw() {{
  links.forEach(function (l, i) {{
    var a = byId[l.source], b = byId[l.target], e = lineEls[i];
    e.setAttribute("x1", a.x); e.setAttribute("y1", a.y);
    e.setAttribute("x2", b.x); e.setAttribute("y2", b.y);
  }});
  data.nodes.forEach(function (n) {{
    n._el.setAttribute("cx", n.x); n._el.setAttribute("cy", n.y);
    n._lbl.setAttribute("x", n.x + n.r + 3);
    n._lbl.setAttribute("y", n.y + 4);
  }});
}}
draw();
// drag support
var drag = null;
function svgXY(ev) {{
  // offsetX/Y are relative to the EVENT TARGET (the circle under the
  // pointer), not the svg — always measure against the svg's box
  var r = svg.getBoundingClientRect();
  return [ev.clientX - r.left, ev.clientY - r.top];
}}
svg.addEventListener("mousedown", function (ev) {{
  var p = svgXY(ev);
  var hit = data.nodes.find(function (n) {{
    var dx = p[0] - n.x, dy = p[1] - n.y;
    return dx * dx + dy * dy <= n.r * n.r;
  }});
  if (hit) drag = hit;
}});
svg.addEventListener("mousemove", function (ev) {{
  if (!drag) return;
  var p = svgXY(ev);
  drag.x = p[0]; drag.y = p[1];
  for (var i = 0; i < 3; i++) step(2);
  drag.x = p[0]; drag.y = p[1];
  draw();
}});
svg.addEventListener("mouseup", function () {{ drag = null; }});
</script>
</body>
</html>
"""


def moebius_html(
    graph: LinkGraph,
    node_id,
    depth: int = 1,
    limit: int = 20,
    path: str | None = None,
    title: str = "linkgraph moebius view",
) -> str:
    """Self-contained HTML rendering of the :func:`moebius_json` payload —
    the engine-side answer to the reference's Moebius D3 notebook UI
    (``mercury/graph/viz/moebius.py:226-442`` + ``frontend/moebius.js``).
    The reference ships a 3.5k-line interactive D3 app; this emits one
    offline file (no CDN scripts, no network fetches) with an embedded
    seeded force layout: same payload ⇒ same picture. Node radius scales
    with full-graph degree (`count`), hover shows id + degree, nodes drag.
    Returns the HTML string; writes it to ``path`` when given."""
    import html as _html
    import string

    payload = moebius_json(graph, node_id, depth=depth, limit=limit)
    page = _MOEBIUS_PAGE.replace("{{", "{").replace("}}", "}")
    # string.Template substitutes every placeholder in ONE pass — values
    # are never re-scanned, so a title containing '${payload}' (or a node
    # id containing '${title}') cannot become an injection point the way
    # chained str.replace could. Title is HTML-escaped; the payload keeps
    # only the "</" escape ("</script>" inside a <script> block would
    # close it early), which leaves JSON semantics unchanged.
    html = string.Template(page).substitute(
        title=_html.escape(title),
        payload=payload.replace("</", "<\\/"),
    )
    if path is not None:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(html)
    return html
