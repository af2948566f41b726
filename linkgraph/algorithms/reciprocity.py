"""Directed-edge reciprocity — the fraction of edges whose reverse edge
also exists (Garlaschelli & Loffredo, "Patterns of link reciprocity in
directed networks", 2004; ``networkx.overall_reciprocity`` semantics).

NOT present in the reference; a one-pass structural summary: canonicalize
to distinct directed simple edges, self-join against the reversed edge set
with a left-semi (no row explosion on hubs), count, divide driver-side.
No window, no iteration, no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph import DST, SRC, LinkGraph


def reciprocity(graph: LinkGraph) -> float:
    """|{(u,v) ∈ E : (v,u) ∈ E}| / |E| over distinct loop-free directed
    edges; NaN on an edgeless graph (networkx raises — we follow the
    engine's NaN-on-degenerate convention, documented deviation). An
    undirected LinkGraph is symmetrized by construction, so it measures 1.0
    trivially."""
    e = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    total = e.count()
    if total == 0:
        return float("nan")
    mutual = e.join(rev, [SRC, DST], "left_semi").count()
    return mutual / total
