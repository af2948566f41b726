"""k-clique percolation (CPM) overlapping community detection.

Palla et al., "Uncovering the overlapping community structure of complex
networks in nature and society" (Nature 435, 2005): two k-cliques are
*adjacent* when they share k-1 nodes; a community is a connected component
of the clique-adjacency graph, and a node belongs to every community whose
cliques contain it (overlapping membership — the property LPA/Louvain
cannot express).

NOT in the reference (no clique or overlapping-community code under
``mercury/``) — this is the overlapping sibling of the required community
detectors, built entirely from this repo's scale paths:

- k-clique listing reuses the kClist orientation plan
  (:func:`linkgraph.algorithms.triangles.k_cliques`) — degree-ordered DAG,
  out-degree O(sqrt(m)).
- clique adjacency is ONE facet shuffle: each clique emits its k
  (k-1)-subsets ("facets"); cliques sharing a facet share k-1 nodes.
  Within a facet bucket we do NOT join all pairs — every clique connects
  to the bucket's min clique key (star reduction), which preserves
  connectivity exactly and keeps hot facets (a (k-1)-clique shared by d
  cliques) linear in d instead of d².
- components over the clique graph reuse the auto-gated two-star /
  local CC solver, so the percolation step inherits its checkpointing
  and skew behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import ID, LinkGraph
from linkgraph.algorithms.components import connected_components
from linkgraph.algorithms.triangles import k_cliques

_SEP = "\x01"


def clique_percolation(graph: LinkGraph, k: int = 3) -> DataFrame:
    """DataFrame[id, community] — k-clique percolation communities.

    ``community`` is the community's lexicographically smallest clique,
    serialized as the comma-joined sorted member list — deterministic,
    relabel-free, independent of enumeration order, and (unlike a
    min-member-id label) unique even when two communities overlap on
    their smallest node. A node may appear in several communities
    (overlap); nodes in no k-clique are absent, per CPM convention. ``k`` must be ≥ 2; k=2
    degenerates to plain connected components of non-isolated nodes.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 for clique percolation, got {k}")
    cols = [f"w{j}" for j in range(1, k + 1)]
    cliques = k_cliques(graph, k)  # members id-sorted within each row
    # stable clique key: the sorted member tuple itself
    ck = cliques.select(
        F.concat_ws(_SEP, *cols).alias("cq"), *cols
    ).persist()
    ck.count()
    try:
        # facets: drop each member once; members stay sorted so equal
        # (k-1)-subsets serialize identically
        facet_cols = [
            F.concat_ws(
                _SEP, *[c for j2, c in enumerate(cols) if j2 != j]
            ).alias("facet")
            for j in range(k)
        ]
        facets = ck.select(
            F.col("cq"),
            F.explode(F.array(*facet_cols)).alias("facet"),
        )
        # star reduction per facet bucket: every clique -> bucket min
        hub = facets.groupBy("facet").agg(F.min("cq").alias("rep"))
        adj = (
            facets.join(hub, "facet")
            .where(F.col("cq") != F.col("rep"))
            .select(F.col("cq").alias("src"), F.col("rep").alias("dst"))
        )
        # isolated cliques (no shared facet) must still surface as
        # singleton communities: self-loops keep them in the node set
        loops = ck.select(
            F.col("cq").alias("src"), F.col("cq").alias("dst")
        )
        labels = connected_components(
            LinkGraph(adj.union(loops)), with_sizes=False
        )
        # community label: the component id IS the component-min clique
        # key (connected_components labels by min node id, and the clique
        # graph's node ids are the sorted-member keys) — unique per
        # community even when two communities OVERLAP on their min node
        # (karate k=3 has exactly that shape: labeling by min member id
        # would silently merge them). Serialize with commas for output.
        member = ck.select(
            "cq", F.explode(F.array(*cols)).alias(ID)
        ).join(labels.withColumnRenamed(ID, "cq"), "cq")
        out = (
            member.select(
                ID,
                F.translate(F.col("component"), _SEP, ",").alias("community"),
            )
            .distinct()
        )
        out = out.localCheckpoint(eager=True)
    finally:
        ck.unpersist()
    return out
