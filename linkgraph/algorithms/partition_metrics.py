"""Partition quality metrics — modularity, volume/cut, conductance.

Public scoring surface for ANY node partition (Louvain/LPA/spectral output,
or an external assignment), decoupled from the clustering loops: the
reference only reports modularity as a Louvain byproduct
(mercury/graph/ml/louvain.py:207-214); here it is a first-class metric.

Accepts either storage convention: a directed LinkGraph is read as
single-stored undirected edges (the ``louvain_communities`` input
contract), an undirected LinkGraph (both directions materialized) is
single-stored internally. All metrics are
one or two algebraic joins + aggregates — no windows, no UDFs, no
iteration; at 100 TB this is a constant number of edge-table scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, SRC, LinkGraph


def _partition(labels: DataFrame, id_col: str, label_col: str) -> DataFrame:
    return labels.select(F.col(id_col).alias("id"), F.col(label_col).alias("c"))


def _single_stored(graph: LinkGraph) -> DataFrame:
    """Edges as ONE row per undirected edge. A directed LinkGraph is taken
    as already single-stored (the ``louvain_communities`` input contract);
    an undirected one has materialized both directions (graph.py:67-68),
    so ``src <= dst`` recovers exactly one copy of every symmetric pair
    (self-loops kept once; parallel edges with distinct weights survive on
    the kept side)."""
    edges = graph.edges
    if not graph.is_directed:
        edges = edges.filter(F.col(SRC) <= F.col(DST))
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1.0))
    return edges


def modularity(
    graph: LinkGraph,
    labels: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
    resolution: float = 1.0,
) -> float:
    """Newman modularity of a partition on a weighted undirected graph:
    Q = Σ_c [ w_in(c)/m − γ·(vol(c)/2m)² ] with w_in the intra-community
    edge weight and vol the community's weighted-degree sum. Nodes absent
    from ``labels`` are excluded (inner-join semantics), matching the
    Louvain internals this reuses."""
    from linkgraph.algorithms.louvain import _modularity

    edges = _single_stored(graph)
    m = edges.agg(F.sum("weight")).collect()[0][0]
    if not m:
        raise ValueError("graph has no edges (or zero total weight)")
    part = _partition(labels, id_col, label_col)
    return _modularity(edges, part, float(m), resolution)


def cut_metrics(
    graph: LinkGraph,
    labels: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Per-community volume, cut weight, and conductance:
    DataFrame[label, volume, cut_weight, conductance] with
    conductance = cut / min(vol, 2m − vol), null for a community whose
    min side has zero volume (the whole graph, or an isolated-node set —
    conductance is undefined there, not 0).

    Shape: one endpoint-union degree aggregate + one edge→labels join
    (twice, on src and dst) + two algebraic groupBys. Cross-community
    edge weight is attributed to BOTH endpoints' communities, the standard
    definition."""
    edges = _single_stored(graph)
    # restrict to ids that exist in the graph: stale/typo'd label ids must
    # not fabricate phantom zero-volume communities (the left join below
    # is for edge-less NODES of the graph, which stay covered)
    part = _partition(labels, id_col, label_col).join(
        graph.nodes.select("id"), "id", "left_semi"
    )

    deg = (
        edges.selectExpr(f"{SRC} as id", "weight")
        .unionByName(edges.selectExpr(f"{DST} as id", "weight"))
        .groupBy("id")
        .agg(F.sum("weight").alias("wdeg"))
    )
    # left join: a community of edge-less nodes still emits a row
    # (volume 0, cut 0, conductance null) as the docstring promises
    vol = (
        part.join(deg, "id", "left")
        .groupBy("c")
        .agg(F.sum(F.coalesce("wdeg", F.lit(0.0))).alias("volume"))
    )
    two_m = edges.agg((F.sum("weight") * 2).alias("t")).select("t")

    le = (
        edges.select(SRC, DST, "weight")
        .join(part.selectExpr(f"id as {SRC}", "c as cSrc"), SRC, "inner")
        .join(part.selectExpr(f"id as {DST}", "c as cDst"), DST, "inner")
        .filter("cSrc != cDst")
    )
    cut = (
        le.selectExpr("cSrc as c", "weight")
        .unionByName(le.selectExpr("cDst as c", "weight"))
        .groupBy("c")
        .agg(F.sum("weight").alias("cut_weight"))
    )
    out = (
        vol.join(cut, "c", "left")
        .na.fill({"cut_weight": 0.0})
        .crossJoin(F.broadcast(two_m))
        .select(
            F.col("c").alias(label_col),
            "volume",
            "cut_weight",
            F.when(
                F.least(F.col("volume"), F.col("t") - F.col("volume")) > 0,
                F.col("cut_weight")
                / F.least(F.col("volume"), F.col("t") - F.col("volume")),
            ).alias("conductance"),
        )
    )
    return out


def quotient_graph(
    graph: LinkGraph,
    labels: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
    keep_self_loops: bool = True,
) -> DataFrame:
    """Contract a partition into its super-graph: one node per community,
    edge weight = summed weight of the member edges between (or within,
    as self-loops) the two communities — the coarsening step after every
    community detection pass (multi-level Louvain, hierarchical layout,
    drill-down dashboards). Returns canonical single-stored edges
    DataFrame[src, dst, weight] with src <= dst (undirected semantics,
    matching the partition-metrics convention); wrap in ``LinkGraph`` to
    feed it back into any operator.

    One labels join per endpoint + one algebraic groupBy — no windows;
    edges with an unlabeled endpoint are dropped (inner-join semantics,
    same as cut_metrics)."""
    edges = _single_stored(graph)
    part = _partition(labels, id_col, label_col)
    le = (
        edges.select(SRC, DST, "weight")
        .join(part.selectExpr(f"id as {SRC}", "c as cs"), SRC, "inner")
        .join(part.selectExpr(f"id as {DST}", "c as cd"), DST, "inner")
    )
    if not keep_self_loops:
        le = le.filter(F.col("cs") != F.col("cd"))
    return (
        le.select(
            F.least("cs", "cd").alias("src"),
            F.greatest("cs", "cd").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def partition_agreement(
    labels_a: DataFrame,
    labels_b: DataFrame,
    id_col: str = "id",
    label_col_a: str = "c",
    label_col_b: str = "c",
) -> dict:
    """Agreement between two node labelings — compare a Louvain run to an
    LPA run, a new run to yesterday's, or either to ground truth.

    Returns ``{"n": int, "mi": float, "nmi": float, "ari": float}``:
    mutual information (nats), NMI with sqrt normalization
    (MI / sqrt(H(A)·H(B))), and the adjusted Rand index
    (Hubert-Arabie). Nodes are matched by inner join on ``id_col`` —
    only co-labeled nodes are compared. Conventions at the degenerate
    edges: two single-cluster (or empty) labelings agree perfectly
    (nmi = ari = 1.0); when exactly one side is trivial the sqrt
    normalizer is 0 and nmi is 0.0.

    Everything is a contingency-table aggregate — one join + three
    algebraic groupBys over (label_a, label_b) counts, no windows, no
    iteration — so the cost at 100 TB is one shuffle on the id join and
    cluster-pair-sized aggregates after it.

    NOT in the reference (it never scores partitions against each other).
    """
    a = labels_a.select(F.col(id_col).alias("id"), F.col(label_col_a).alias("ca"))
    b = labels_b.select(F.col(id_col).alias("id"), F.col(label_col_b).alias("cb"))
    cont = (
        a.join(b, "id")
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).alias("nij"))
        .persist()
    )
    try:
        row = cont.agg(
            F.sum("nij").alias("n"),
            F.count(F.lit(1)).alias("cells"),
            F.countDistinct("ca").alias("ka"),
            F.countDistinct("cb").alias("kb"),
            F.sum(F.col("nij") * (F.col("nij") - 1) / 2.0).alias("pair_ij"),
        ).collect()[0]
        n = int(row["n"] or 0)
        if n == 0 or (row["ka"] <= 1 and row["kb"] <= 1):
            return {"n": n, "mi": 0.0, "nmi": 1.0, "ari": 1.0}
        am = cont.groupBy("ca").agg(F.sum("nij").alias("ai"))
        bm = cont.groupBy("cb").agg(F.sum("nij").alias("bj"))
        mi = (
            cont.join(am, "ca")
            .join(bm, "cb")
            .agg(
                F.sum(
                    F.col("nij")
                    / n
                    * F.log(n * F.col("nij") / (F.col("ai") * F.col("bj")))
                ).alias("mi")
            )
            .collect()[0]["mi"]
        )
        ent = lambda m, c: -(
            m.agg(
                F.sum(F.col(c) / n * F.log(F.col(c) / n)).alias("h")
            ).collect()[0]["h"]
            or 0.0
        )
        ha, hb = ent(am, "ai"), ent(bm, "bj")
        nmi = 0.0 if ha * hb <= 0 else float(mi) / (ha * hb) ** 0.5
        pa = am.agg(
            F.sum(F.col("ai") * (F.col("ai") - 1) / 2.0).alias("p")
        ).collect()[0]["p"]
        pb = bm.agg(
            F.sum(F.col("bj") * (F.col("bj") - 1) / 2.0).alias("p")
        ).collect()[0]["p"]
        total = n * (n - 1) / 2.0
        expected = pa * pb / total if total else 0.0
        denom = (pa + pb) / 2.0 - expected
        ari = 1.0 if denom == 0 else (float(row["pair_ij"]) - expected) / denom
        return {"n": n, "mi": float(mi or 0.0), "nmi": float(nmi), "ari": float(ari)}
    finally:
        cont.unpersist()
