"""Vertex-cut edge partitioning — degree-based hashing (DBH).

Edge partitioning (assign EDGES to workers, replicate vertices) is the
placement model that makes power-law graphs computable at trillion-edge
scale (PowerGraph/PowerLyra lineage; cf. "Distributed Edge Partitioning for
Trillion-edge Graphs", VLDB'19, and "Hybrid Edge Partitioner", SIGMOD'21, in
PAPERS.md). DBH (Xie et al., NIPS'14) is the streaming-free, shuffle-light
member of that family: an edge lands on the partition chosen by hashing its
LOWER-degree endpoint, so hub vertices are the ones that get cut — their
edges spread across partitions (replicating the cheap low-degree endpoint)
instead of piling onto one worker.

Everything here is a pure function of the edge set (md5-based hash, no RNG),
so placements are reproducible across runs, partitionings, and engines — an
external SQL engine can replay the assignment byte-for-byte.

NOT in the reference (mercury-graph has no placement/partitioning layer);
included because a 100 TB link graph is unusable without a placement story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.algorithms.triangles import _canonical_undirected, _degrees_of


def _hash_mod(col: F.Column, n_parts: int, salt: int) -> F.Column:
    """First 48 bits of md5(value|salt) mod n_parts — cross-engine
    replayable (same shape as approx_triangle_count's deterministic coin)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", col, F.lit(str(salt)))), 1, 12),
            16,
            10,
        ).cast("long")
        % n_parts
    )


def dbh_edge_partition(
    graph: LinkGraph, n_parts: int, salt: int = 42
) -> DataFrame:
    """DataFrame[a, b, part] — every canonical undirected edge (a < b,
    loops dropped) with its DBH partition: part = H(endpoint with the
    smaller undirected degree; ties → a) mod n_parts.

    Plan: one degree aggregate, two hash joins to annotate endpoints, one
    JVM md5 projection — no windows, no Python, and the only shuffles are
    the degree aggregate and the two degree joins (each keyed on a node
    column, never on the full edge)."""
    if n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    und = _canonical_undirected(graph)
    deg = _degrees_of(und)
    ann = und.join(
        deg.select(F.col("id").alias("a"), F.col("deg").alias("_da")), "a"
    ).join(deg.select(F.col("id").alias("b"), F.col("deg").alias("_db")), "b")
    pick = F.when(F.col("_db") < F.col("_da"), F.col("b")).otherwise(F.col("a"))
    return ann.select(
        "a", "b", _hash_mod(pick, n_parts, salt).cast("int").alias("part")
    )


def partition_stats(assignments: DataFrame) -> DataFrame:
    """One-row quality summary of a vertex-cut assignment [a, b, part]:

    - ``replication_factor``: avg number of distinct partitions each vertex
      appears in (the vertex-cut cost metric; 1.0 = no vertex is cut),
    - ``balance``: max partition edge count / mean partition edge count
      (1.0 = perfectly even),
    - ``n_parts_used``, ``n_edges``, ``n_vertices``.

    Two algebraic aggregates over the exploded (vertex, part) incidence —
    no windows, no Python."""
    inc = assignments.select(
        F.col("a").alias("v"), "part"
    ).unionByName(assignments.select(F.col("b").alias("v"), "part"))
    vp = inc.distinct().groupBy("v").agg(F.count(F.lit(1)).alias("np"))
    rep = vp.agg(
        F.avg("np").alias("replication_factor"),
        F.count(F.lit(1)).alias("n_vertices"),
    )
    per_part = assignments.groupBy("part").agg(F.count(F.lit(1)).alias("ne"))
    bal = per_part.agg(
        (F.max("ne") / F.avg("ne")).alias("balance"),
        F.count(F.lit(1)).alias("n_parts_used"),
        F.sum("ne").alias("n_edges"),
    )
    return rep.crossJoin(bal).select(
        "replication_factor", "balance", "n_parts_used", "n_edges", "n_vertices"
    )


def hybrid_edge_partition(
    graph: LinkGraph, n_parts: int, threshold: int = 100, salt: int = 42
) -> DataFrame:
    """DataFrame[src, dst, part] — PowerLyra-style hybrid-cut placement of
    the DIRECTED edge set (cf. "Hybrid Edge Partitioner", SIGMOD'21, in
    PAPERS.md): an edge into a LOW-in-degree target (in-deg ≤ threshold)
    goes to H(dst) — edge-cut style, so an ordinary vertex's whole in-
    neighborhood is co-located and its gather phase is local; an edge into
    a HIGH-in-degree target goes to H(src) — vertex-cut style, so a hub's
    in-edges spread across the partitions where their sources already live
    instead of overwhelming one worker.

    Same pure-function md5 placement as :func:`dbh_edge_partition`
    (engine-replayable); distinct directed edges, self-loops dropped. Plan:
    one in-degree aggregate + one dst-keyed join + one JVM md5 projection.
    Quality metrics via :func:`partition_stats` (rename src/dst → a/b)."""
    if n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0, got {threshold}")
    from linkgraph.graph import DST, SRC

    e = (
        graph.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    indeg = e.groupBy(DST).agg(F.count(F.lit(1)).alias("_ind"))
    pick = F.when(F.col("_ind") <= threshold, F.col(DST)).otherwise(F.col(SRC))
    return e.join(indeg, DST).select(
        SRC, DST, _hash_mod(pick, n_parts, salt).cast("int").alias("part")
    )
