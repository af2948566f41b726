"""aggregate_messages — the generic Pregel-style message/aggregate primitive.

The building block GraphFrames exposes as ``AggregateMessages`` and the
reference lacks entirely: every superstep operator in this engine
(pagerank's contribution sum, LPA's label vote, SSSP's relaxation) is an
instance of "each edge sends an expression of (src attrs, edge attrs,
dst attrs) to one endpoint; each node aggregates what it received". This
module exposes that shape directly so users can prototype custom graph
computations without writing the join plumbing — and get the engine's
canonical physical plan for it.

Physical shape: one join of edges to the node-attribute table per side
actually referenced, then ONE algebraic groupBy on the receiving endpoint.
Messages to dst and to src union before the aggregate, so both directions
ride a single shuffle. No windows, no UDFs, no driver loop.

Column namespace inside message expressions: ``src_<attr>`` / ``dst_<attr>``
for node attributes (from the supplied ``node_attrs`` table), every edge
column under its own name (``src``, ``dst``, ``weight``, ...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


def aggregate_messages(
    graph: LinkGraph,
    agg: Column,
    to_dst: Column | None = None,
    to_src: Column | None = None,
    node_attrs: DataFrame | None = None,
    msg_col: str = "msg",
) -> DataFrame:
    """DataFrame[id, <agg alias>] — for each node, ``agg`` evaluated over
    the multiset of messages it received. ``to_dst`` is sent along every
    edge to its destination, ``to_src`` to its source; either may be None
    (at least one required). ``agg`` must reference the message as
    ``F.col(msg_col)`` and carry its own ``.alias(...)``.

    ``node_attrs`` (optional, default ``graph.nodes``) provides the
    ``src_*`` / ``dst_*`` columns; nodes missing from it simply contribute
    null attributes (left join), mirroring GraphFrames. A node that
    receives no messages emits no row — outer-join against the node table
    if zero-fill is wanted."""
    if to_dst is None and to_src is None:
        raise ValueError("provide at least one of to_dst / to_src")
    attrs = node_attrs if node_attrs is not None else graph.nodes
    acols = [c for c in attrs.columns if c != ID]
    edges = graph.edges

    def side(prefix: str, key: str) -> DataFrame:
        return attrs.select(
            F.col(ID).alias(key),
            *[F.col(c).alias(f"{prefix}_{c}") for c in acols],
        )

    triplet = edges
    if acols:
        triplet = triplet.join(side("src", SRC), SRC, "left").join(
            side("dst", DST), DST, "left"
        )
    parts = []
    if to_dst is not None:
        parts.append(
            triplet.select(F.col(DST).alias(ID), to_dst.alias(msg_col))
        )
    if to_src is not None:
        parts.append(
            triplet.select(F.col(SRC).alias(ID), to_src.alias(msg_col))
        )
    msgs = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return msgs.groupBy(ID).agg(agg)
