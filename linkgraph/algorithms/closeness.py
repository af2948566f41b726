"""Closeness centrality via (landmark-sampled) multi-source BFS.

The reference computes all-pairs shortest paths with GraphFrames
``shortestPaths(landmarks=all nodes)`` and then
``closeness = (N-1) / Σ distances`` via the SQL higher-order function
``aggregate(map_values(distances), 0, (acc, x) -> acc + x)``
(``mercury/graph/core/graph.py:656-671``). All-pairs BFS is O(V·E) — exact
only for small graphs; at scale pass ``landmarks`` (a sample of nodes) for
the standard landmark approximation.

BFS here is an iterative frontier join: distances from node x to landmark l
follow edge direction (as GraphFrames shortestPaths does), so the frontier
expands from landmarks along REVERSED edges, one superstep per hop, with a
left_anti dedup against settled distances.

Deviation: nodes that reach no landmark (sum of distances 0) get closeness
0.0 instead of a division-by-zero null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def shortest_path_lengths(
    graph: LinkGraph,
    landmarks: DataFrame | list | None = None,
    max_hops: int = 50,
    max_all_pairs_nodes: int = 100_000,
) -> DataFrame:
    """DataFrame[id, landmark, dist] — hop distance id→landmark along edges.

    ``landmarks=None`` means ALL nodes are landmarks — exact all-pairs BFS,
    O(V·E). That is the reference's semantics but only sane on small graphs,
    so it is size-guarded like betweenness: above ``max_all_pairs_nodes``
    pass an explicit landmark sample instead.
    """
    spark = graph.edges.sparkSession
    if landmarks is None:
        n = graph.number_of_nodes()
        if n > max_all_pairs_nodes:
            raise ValueError(
                f"all-pairs BFS (landmarks=None) is O(V*E); graph has {n} "
                f"nodes > max_all_pairs_nodes={max_all_pairs_nodes}. Pass a "
                "landmark sample for the standard approximation."
            )
        lm = graph.nodes.select(F.col(ID).alias("landmark"))
    elif isinstance(landmarks, list):
        lm = spark.createDataFrame([(x,) for x in landmarks], ["landmark"])
    else:
        lm = landmarks.select(F.col(landmarks.columns[0]).alias("landmark"))

    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        # pre-partition on the frontier-join key and PIN (persist keeps the
        # partitioning visible to Catalyst — a localCheckpoint degrades to
        # an unknown-partitioning RDD scan and re-exchanges the edge-sized
        # table every hop); only the frontier shuffles per hop
        rev = pin_partitioned(
            graph.edges.select(F.col(DST).alias("u"), F.col(SRC).alias("v"))
            .distinct()
            .repartition(npart, "u")
        )

        settled = lm.select(
            F.col("landmark").alias(ID), F.col("landmark"), F.lit(0).alias("dist")
        ).localCheckpoint(eager=True)
        frontier = settled
        for hop in range(1, max_hops + 1):
            nxt = (
                # shuffle_hash: build the frontier, stream the pinned edges
                frontier.hint("shuffle_hash").join(rev, frontier[ID] == rev["u"])
                .select(F.col("v").alias(ID), "landmark", F.lit(hop).alias("dist"))
                .distinct()
                .join(settled.select(ID, "landmark"), [ID, "landmark"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.limit(1).count() == 0:
                break
            settled = settled.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        rev.unpersist()
        return settled


def harmonic_centrality(
    graph: LinkGraph, landmarks: DataFrame | list | None = None, max_hops: int = 50
) -> DataFrame:
    """DataFrame[id, harmonic] = Σ_landmark 1/dist(id → landmark), dist > 0.

    Harmonic centrality (Boldi & Vigna, "Axioms for centrality", 2014) is the
    standard closeness fix for disconnected graphs: unreachable pairs
    contribute 0 naturally instead of poisoning the sum. Shares the landmark
    multi-source BFS with closeness — same frontier plan, different final
    aggregate — so its scale profile is identical (one superstep per hop,
    left_anti dedup, algebraic sums)."""
    dists = shortest_path_lengths(graph, landmarks, max_hops)
    sums = (
        dists.filter(F.col("dist") > 0)
        .groupBy(ID)
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("_h"))
    )
    return (
        graph.nodes.select(ID)
        .join(sums, ID, "left")
        .select(ID, F.coalesce(F.col("_h"), F.lit(0.0)).alias("harmonic"))
    )


def closeness_centrality(
    graph: LinkGraph, landmarks: DataFrame | list | None = None, max_hops: int = 50
) -> DataFrame:
    """DataFrame[id, closeness] = (N-1) / Σ_landmark dist(id → landmark)."""
    n = graph.number_of_nodes()
    dists = shortest_path_lengths(graph, landmarks, max_hops)
    sums = dists.groupBy(ID).agg(F.sum("dist").alias("_s"))
    return (
        graph.nodes.select(ID)
        .join(sums, ID, "left")
        .select(
            ID,
            F.when(
                F.coalesce(F.col("_s"), F.lit(0)) > 0, F.lit(float(n - 1)) / F.col("_s")
            )
            .otherwise(F.lit(0.0))
            .alias("closeness"),
        )
    )


def eccentricity(
    graph: LinkGraph, landmarks: DataFrame | list | None = None, max_hops: int = 50
) -> DataFrame:
    """DataFrame[id, ecc] = max hop-distance id → landmark over REACHED
    landmarks (nodes reaching none get 0). With ``landmarks=None`` (all
    nodes, size-guarded like closeness) this is exact eccentricity on each
    node's reachable set; with a landmark sample it is the standard lower
    bound. Shares the multi-source BFS — one extra max aggregate."""
    dists = shortest_path_lengths(graph, landmarks, max_hops)
    mx = dists.groupBy(ID).agg(F.max("dist").alias("_e"))
    return (
        graph.nodes.select(ID)
        .join(mx, ID, "left")
        .select(ID, F.coalesce(F.col("_e"), F.lit(0)).alias("ecc"))
    )


def diameter_lower_bound(
    graph: LinkGraph, landmarks: DataFrame | list | None = None, max_hops: int = 50
) -> int:
    """max over nodes of ``eccentricity`` — exact diameter of the largest
    reachable structure when landmarks=None, a lower bound under sampling
    (the standard landmark heuristic)."""
    row = eccentricity(graph, landmarks, max_hops).agg(
        F.max("ecc").alias("d")
    ).collect()[0]
    return int(row["d"] or 0)


def global_efficiency(
    graph: LinkGraph, landmarks: DataFrame | list | None = None, max_hops: int = 50
) -> float:
    """Latora-Marchiori global efficiency: mean of 1/dist over ordered
    node pairs, Σ_{u≠v} 1/d(u,v) / (n·(n−1)) — unreachable pairs
    contribute 0 (networkx ``global_efficiency`` parity on undirected
    graphs, which materialize both directions here). Pure aggregate over
    the harmonic sums, so it shares the landmark BFS scale profile; with
    a landmark sample it estimates Σ over the sampled columns scaled by
    n−1 per node (the standard landmark estimator)."""
    n = graph.number_of_nodes()
    if n < 2:
        return 0.0
    h = harmonic_centrality(graph, landmarks, max_hops)
    total = h.agg(F.sum("harmonic")).collect()[0][0] or 0.0
    if landmarks is None:
        return float(total) / (n * (n - 1))
    if isinstance(landmarks, list):
        k = len(set(landmarks))
    else:
        k = landmarks.distinct().count()
    # sampled columns: each node contributed ≤ k reciprocal distances;
    # rescale to the full n−1 columns
    return float(total) * (n - 1) / max(k, 1) / (n * (n - 1))
