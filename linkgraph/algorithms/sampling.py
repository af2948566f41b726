"""Deterministic neighbor sampling — the GNN-training mini-batch primitive.

NOT present in the reference (its only sampler is node2vec's random-walk
corpus, ``mercury/graph/embeddings/graphembeddings.py`` — no per-node
fanout sampling); added because GraphSAGE-style training over a 100-TB
edge table starts with "give me ≤ f neighbors per seed, reproducibly":
a sampler that changes between the feature-build run and the label-build
run silently corrupts the training set.

Determinism without state: each edge's sampling priority is
``md5(src <0x1f> dst <0x1f> seed)`` — a pure column expression, identical
on every executor, every retry, every engine (the DuckDB oracles replay
it verbatim). Changing ``seed`` draws a fresh independent sample; keeping
it pins the sample forever.

Scale shape: the per-node top-fanout is a ``row_number`` window over
(node, priority) — the one window shape this engine keeps, because Spark 4
rewrites ``rank <= k`` into ``WindowGroupLimit`` with a Partial stage
BEFORE the exchange, so each map task forwards at most ``fanout`` rows per
node and a 10M-degree hub never lands in one task (measured:
BENCH/lpa_top1_ab.md). Multi-hop sampling is per-layer: frontier ←
distinct sampled neighbors, edges accumulate with their layer index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph

_SEP = "\x1f"


def _priority(seed: int) -> F.Column:
    return F.md5(F.concat_ws(_SEP, F.col(SRC), F.col(DST), F.lit(str(seed))))


def sample_neighbors(
    graph: LinkGraph, fanout: int, seed: int = 0, edges: DataFrame | None = None
) -> DataFrame:
    """DataFrame[src, dst] — at most ``fanout`` out-edges per node, chosen
    by ascending md5 priority (uniform over the distinct out-edge set,
    independent across seeds). Nodes with out-degree ≤ fanout keep all
    their edges. ``edges`` restricts sampling to a subset (used by the
    multi-hop driver); defaults to the graph's full edge set."""
    if fanout < 1:
        raise ValueError(f"fanout must be >= 1, got {fanout}")
    e = (edges if edges is not None else graph.edges).select(SRC, DST).distinct()
    w = Window.partitionBy(SRC).orderBy(_priority(seed))
    return (
        e.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= fanout)
        .drop("_rk")
    )


def sample_neighborhood(
    graph: LinkGraph,
    seeds: DataFrame | list,
    fanouts: list[int],
    seed: int = 0,
) -> DataFrame:
    """DataFrame[layer, src, dst] — GraphSAGE k-hop sampled block: layer 0
    samples ``fanouts[0]`` out-edges from the seed nodes, layer 1 samples
    ``fanouts[1]`` from the layer-0 neighbors, … Frontiers are distinct
    node sets (a node reached twice is expanded once); the per-layer
    priority namespace is ``seed + layer`` so layers draw independent
    samples. Edge direction is followed (undirected graphs already
    materialize both directions)."""
    if not fanouts:
        raise ValueError("fanouts must be non-empty")
    spark = graph.edges.sparkSession
    if isinstance(seeds, list):
        if not seeds:
            raise ValueError("seeds must be non-empty")
        frontier = spark.createDataFrame([(x,) for x in seeds], [ID])
    else:
        frontier = seeds.select(F.col(seeds.columns[0]).alias(ID))
    frontier = frontier.distinct()
    out: DataFrame | None = None
    for layer, f_k in enumerate(fanouts):
        layer_edges = graph.edges.join(
            frontier, graph.edges[SRC] == frontier[ID], "left_semi"
        )
        sampled = sample_neighbors(
            graph, f_k, seed=seed + layer, edges=layer_edges
        ).select(F.lit(layer).alias("layer"), SRC, DST)
        out = sampled if out is None else out.unionByName(sampled)
        frontier = sampled.select(F.col(DST).alias(ID)).distinct()
    return out
