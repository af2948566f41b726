"""Graph snapshot diff — what changed between two edge-table versions.

Beyond the reference (``mercury/graph`` has no versioning utilities); a
production link graph is rebuilt on a cadence, and the first operational
question after every rebuild is "what changed, and did any node's
connectivity move more than it should" (alerting on ingest regressions,
explaining rank churn). Pure anti-joins + one algebraic degree aggregate —
no windows, no iteration, shuffle on the edge key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


def edge_diff(old: LinkGraph, new: LinkGraph) -> DataFrame:
    """DataFrame[src, dst, change] — 'added' rows exist only in ``new``,
    'removed' only in ``old``; unchanged edges are absent. Distinct edge
    keys only (weight changes are not flagged — diff weights by joining
    the snapshots directly)."""
    o = old.edges.select(SRC, DST).distinct()
    n = new.edges.select(SRC, DST).distinct()
    return n.join(o, [SRC, DST], "left_anti").select(
        SRC, DST, F.lit("added").alias("change")
    ).unionByName(
        o.join(n, [SRC, DST], "left_anti").select(
            SRC, DST, F.lit("removed").alias("change")
        )
    )


def degree_delta(old: LinkGraph, new: LinkGraph) -> DataFrame:
    """DataFrame[id, old_degree, new_degree, delta] — total-degree change
    per node across snapshots (0-filled on either side; nodes with no
    change INCLUDED when present in either snapshot, so alert thresholds
    can see the full distribution)."""

    def deg(g: LinkGraph, name: str) -> DataFrame:
        e = g.edges.select(SRC, DST).distinct()
        ends = e.select(F.col(SRC).alias(ID)).unionByName(
            e.select(F.col(DST).alias(ID))
        )
        return ends.groupBy(ID).agg(F.count(F.lit(1)).alias(name))

    return (
        deg(old, "old_degree")
        .join(deg(new, "new_degree"), ID, "full")
        .select(
            ID,
            F.coalesce("old_degree", F.lit(0)).alias("old_degree"),
            F.coalesce("new_degree", F.lit(0)).alias("new_degree"),
            (
                F.coalesce("new_degree", F.lit(0))
                - F.coalesce("old_degree", F.lit(0))
            ).alias("delta"),
        )
    )
