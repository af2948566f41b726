"""SCAN — Structural Clustering Algorithm for Networks (Xu et al., KDD'07)
plus the standalone structural edge similarity it is built on.

NOT present in the reference (no structural-clustering code under
``mercury/``); complements Louvain/LPA: where modularity methods only
partition, SCAN additionally separates HUBS (bridge multiple clusters) from
OUTLIERS (attach to none) — exactly the noise/bridge distinction a web-scale
link graph needs before trusting communities.

Definitions (cosine variant, closed neighborhoods Γ(x) = N(x) ∪ {x}):

    σ(u, v)  = |Γ(u) ∩ Γ(v)| / sqrt(|Γ(u)| · |Γ(v)|)        for edge (u, v)
    core(v)  ⇔ |{u ∈ Γ(v) : σ(u, v) ≥ eps}| ≥ mu            (v itself counts:
                σ(v, v) = 1)
    clusters = connected components over core–core edges with σ ≥ eps,
               labeled by min core id (deterministic)
    border   = non-core with an eps-edge to a core → min adjacent cluster
    hub      = unclustered with neighbors (any edge) in ≥ 2 clusters
    outlier  = everything else

Distributed plan — every step is joins + algebraic aggregates, no windows,
no Python:

1. σ per edge: |Γ(u) ∩ Γ(v)| = triangle support(u, v) + 2, so similarity
   reuses the degree-ordered, hub-safe triangle enumeration
   (:mod:`.triangles`) — one wedge self-join bounded O(sqrt(m)) per node —
   plus a degree join. No neighbor-set materialization, no all-pairs.
2. core flags: one groupBy over the eps-filtered edge list.
3. clusters: :func:`linkgraph.connected_components` on the core subgraph
   (two-star at scale, local under the size gate).
4. border/hub attach: two semi/left joins against the cluster labels.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import ID, LinkGraph

from .components import connected_components
from .ktruss import _edge_support
from .triangles import _canonical_undirected, _degrees_of


def structural_similarity(graph: LinkGraph, _und: DataFrame | None = None) -> DataFrame:
    """DataFrame[a, b, similarity] over canonical undirected edges (a < b):
    the SCAN cosine similarity of closed neighborhoods. Support comes from
    one triangle pass; edges in no triangle get support 0 (σ = 2/sqrt(…)).

    ``_und`` (private): a precomputed, caller-persisted canonical edge set —
    lets :func:`scan_clustering` share ONE canonicalization shuffle between
    the similarity pass and its own hub detection."""
    owned = _und is None
    und = _canonical_undirected(graph).persist() if owned else _und
    deg = _degrees_of(und)
    supp = _edge_support(und)  # materialized (localCheckpoint) inside
    # shuffle_hash hints: supp/deg carry no usable size statistics (supp is
    # checkpointed, deg is an aggregate inheriting the edge scan's
    # estimate), so left alone the planner sort-merges and SORTS the
    # canonical edge table three times; building the (smaller) support and
    # degree tables streams the edge side instead (guide §3.1)
    sim = (
        und.join(supp.hint("shuffle_hash"), ["a", "b"], "left")
        .join(
            deg.select(F.col(ID).alias("a"), F.col("deg").alias("da")).hint(
                "shuffle_hash"
            ),
            "a",
        )
        .join(
            deg.select(F.col(ID).alias("b"), F.col("deg").alias("db")).hint(
                "shuffle_hash"
            ),
            "b",
        )
        .select(
            "a",
            "b",
            (
                (F.coalesce(F.col("support"), F.lit(0)) + F.lit(2)).cast("double")
                / F.sqrt((F.col("da") + 1).cast("double") * (F.col("db") + 1))
            ).alias("similarity"),
        )
    )
    sim = sim.localCheckpoint(eager=True)
    if owned:
        und.unpersist()
    return sim


@dataclass
class ScanResult:
    labels: DataFrame  # [id, role, cluster] — cluster null for hub/outlier
    similarity: DataFrame  # [a, b, similarity]


def scan_clustering(
    graph: LinkGraph,
    eps: float = 0.7,
    mu: int = 2,
    cc_strategy: str = "auto",
) -> ScanResult:
    """SCAN over an undirected simple view of ``graph``. Deterministic:
    clusters are labeled by their min core id and borders attach to their
    min adjacent cluster, so reruns (and the SQL oracle) agree bit-exactly.
    """
    if not 0.0 < eps <= 1.0:
        raise ValueError(f"eps must be in (0, 1], got {eps}")
    if mu < 2:
        raise ValueError(f"mu must be >= 2, got {mu}")
    spark = graph.edges.sparkSession
    und = _canonical_undirected(graph).persist()
    sim = structural_similarity(graph, _und=und)
    eps_edges = sim.filter(F.col("similarity") >= eps).select("a", "b")
    eps_edges = eps_edges.persist()

    # eps-neighborhood size = incident eps-edges + 1 (σ(v,v)=1 always passes)
    inc = (
        eps_edges.select(F.col("a").alias(ID))
        .union(eps_edges.select(F.col("b").alias(ID)))
        .groupBy(ID)
        .agg((F.count(F.lit(1)) + 1).alias("eps_size"))
    )
    nodes = graph.nodes.select(ID)
    cores = inc.filter(F.col("eps_size") >= mu).select(ID)
    cores = cores.persist()

    # clusters: components over core–core eps-edges; isolated cores (an
    # eps-neighborhood of only non-cores) still form singleton clusters
    core_edges = eps_edges.join(
        cores.withColumnRenamed(ID, "a"), "a", "leftsemi"
    ).join(cores.withColumnRenamed(ID, "b"), "b", "leftsemi")
    sub = LinkGraph(
        core_edges.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        nodes=cores,
        keys={"directed": False},
    )
    comp = connected_components(
        sub, with_sizes=False, strategy=cc_strategy
    ).select(ID, F.col("component").alias("cluster"))
    comp = comp.persist()

    # border attachment: non-core u with an eps-edge to a clustered core,
    # min cluster wins
    eps_sym = eps_edges.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        eps_edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    border = (
        eps_sym.join(comp.withColumnRenamed(ID, "v"), "v")
        .join(comp.withColumnRenamed(ID, "u").withColumnRenamed("cluster", "_c"),
              "u", "anti")
        .groupBy(F.col("u").alias(ID))
        .agg(F.min("cluster").alias("cluster"))
    )

    member = comp.select(ID, "cluster", F.lit("core").alias("role")).union(
        border.select(ID, "cluster", F.lit("border").alias("role"))
    )
    member = member.persist()

    # hubs vs outliers among the rest: neighbors' clusters over ALL edges —
    # reusing the persisted canonical set and semi-joined down to the
    # (typically few) unclustered nodes BEFORE the distinct-cluster
    # aggregate, so members never enter this shuffle
    und_sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    rest = nodes.join(member, ID, "anti")
    rest = rest.persist()
    nclusters = (
        und_sym.join(rest.withColumnRenamed(ID, "u"), "u", "leftsemi")
        .join(member.select(F.col(ID).alias("v"), "cluster"), "v")
        .groupBy(F.col("u").alias(ID))
        .agg(F.count_distinct("cluster").alias("_nc"))
    )
    rest_roles = (
        rest.join(nclusters, ID, "left")
        .select(
            ID,
            F.lit(None).cast(member.schema["cluster"].dataType).alias("cluster"),
            F.when(F.coalesce(F.col("_nc"), F.lit(0)) >= 2, F.lit("hub"))
            .otherwise(F.lit("outlier"))
            .alias("role"),
        )
    )
    labels = member.select(ID, "role", "cluster").union(
        rest_roles.select(ID, "role", "cluster")
    )
    labels = labels.localCheckpoint(eager=True)
    for df in (und, eps_edges, cores, comp, member, rest):
        df.unpersist()
    return ScanResult(labels=labels, similarity=sim)
