"""Spectral (power-iteration) clustering over a graph.

The reference's ``SpectralClustering`` spark mode
(``mercury/graph/ml/spectral.py:118-152``) delegates to
``pyspark.ml.clustering.PowerIterationClustering`` on integer-mapped edges —
PIC ships with pyspark.ml (not GraphFrames), so it is kept. Replaced: the
``monotonically_increasing_id`` int mapping (spectral.py:125-127) with our
deterministic xxhash64 encoding, and the per-cluster driver loop for
modularity (spectral.py:158-183) with one aggregation (the same formula as
Louvain's, louvain.py:398-448).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


@dataclass
class SpectralResult:
    labels: DataFrame  # [id, cluster]
    modularity: float
    k: int


def spectral_clustering(
    graph: LinkGraph, k: int = 2, max_iter: int = 10
) -> SpectralResult:
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.ml.clustering import PowerIterationClustering

    enc, mapping = graph.encode_ids()
    w = enc.weight_col()
    pic_edges = enc.edges.select(
        F.col(SRC).alias("src"), F.col(DST).alias("dst"), w.alias("weight")
    )
    pic = PowerIterationClustering(
        k=k, maxIter=max_iter, srcCol="src", dstCol="dst", weightCol="weight"
    )
    assign = pic.assignClusters(pic_edges)  # [id, cluster]
    labels = (
        mapping.join(assign, mapping["code"] == assign["id"])
        .select(mapping[ID], F.col("cluster"))
    )

    # modularity of the found partition, one aggregation (no driver loop)
    from linkgraph.algorithms.louvain import _modularity

    edges_w = graph.edges.select(SRC, DST, graph.weight_col().alias("weight"))
    m = float(edges_w.agg(F.sum("weight")).collect()[0][0])
    part = labels.select(ID, F.col("cluster").alias("c"))
    q = _modularity(edges_w, part, m, resolution=1.0)
    return SpectralResult(labels=labels, modularity=q, k=k)
