"""Local graph clustering — personalized-PageRank sweep cut (Andersen,
Chung & Lang, FOCS'06): around a seed node, find the prefix of the
PPR-ordered sweep with minimum conductance.

NOT in the reference (no local-clustering surface under ``mercury/``);
the standard seeded community-detection primitive (find THIS node's
community without touching the rest of the graph).

Split of labor, the same contract as landmark closeness / betweenness:
the PPR itself runs on the DISTRIBUTED engine
(:func:`linkgraph.algorithms.pagerank.pagerank` with a seed
personalization — fixed supersteps, one exchange each); the sweep runs
driver-local over the PPR SUPPORT ONLY, which is what makes the method
"local" in the literature too — the support is probed against
``max_support`` BEFORE any collect, and the induced edge count is probed
the same way. Inside the guard it is numpy-sized by construction.

Determinism across engines (and the DuckDB oracle): the sweep orders by
``round(score/deg, 9)`` descending with node-id tie-break — the 9-dp
rounding pins the order against last-ulp summation differences between
engines, the same reproducibility discipline as the repo's millionths
outputs. Conductance φ(S) = cut(S) / min(vol(S), 2m − vol(S)) over the
FULL graph volume; prefixes whose min side is zero are skipped; ties on
φ take the SMALLEST prefix.

The sweep half (:func:`sweep_cut`) is shared with the heat-kernel
variant (:mod:`linkgraph.algorithms.heat_kernel`) — any positive
per-node score vector defines a sweep order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


def sweep_cut(
    graph: LinkGraph,
    scores: DataFrame,
    score_col: str = "pagerank",
    max_support: int = 100_000,
) -> DataFrame:
    """DataFrame[id, sweep_pos, phi_millionths] — minimum-conductance
    prefix of the degree-normalized sweep over ``scores`` (module
    docstring). ``scores`` rows with score ≤ 0 are excluded from the
    support; both the support size and the induced edge count are probed
    against ``max_support`` BEFORE any collect."""
    spark = graph.edges.sparkSession
    support = scores.filter(F.col(score_col) > 0)
    n_sup = support.limit(max_support + 1).count()
    if n_sup > max_support:
        raise ValueError(
            f"diffusion support exceeds max_support={max_support}; lower "
            "the iteration budget or raise the guard explicitly"
        )
    # undirected simple view for volumes/cuts
    und = (
        graph.edges.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    try:
        m = und.count()
        deg = (
            und.select(F.col("a").alias(ID))
            .unionByName(und.select(F.col("b").alias(ID)))
            .groupBy(ID)
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        sup = (
            support.join(deg, ID)
            .select(ID, F.col(score_col).alias("_score"), "deg")
            .persist()
        )
        rows = sup.collect()
        inner = (
            und.join(sup.select(F.col(ID).alias("a")), "a", "leftsemi")
            .join(sup.select(F.col(ID).alias("b")), "b", "leftsemi")
        )
        if inner.limit(4 * max_support + 1).count() > 4 * max_support:
            raise ValueError(
                "induced support subgraph too dense for the driver-local "
                "sweep; lower the iteration budget"
            )
        in_edges = [(r["a"], r["b"]) for r in inner.collect()]
        sup.unpersist()
    finally:
        und.unpersist()

    order = sorted(
        rows, key=lambda r: (-round(r["_score"] / r["deg"], 9), r[ID])
    )
    pos = {r[ID]: i for i, r in enumerate(order)}
    # per-position count of induced edges whose LATER endpoint enters there
    enters = [0] * len(order)
    for a, b in in_edges:
        enters[max(pos[a], pos[b])] += 1
    best_phi, best_k = None, None
    vol = 0
    within = 0
    for i, r in enumerate(order):
        vol += r["deg"]
        within += enters[i]
        cut = vol - 2 * within
        den = min(vol, 2 * m - vol)
        if den <= 0:
            continue
        phi = cut / den
        if best_phi is None or phi < best_phi - 1e-15:
            best_phi, best_k = phi, i
    if best_k is None:
        raise ValueError("no sweep prefix with positive min-side volume")
    out = [
        (r[ID], i, int(round(best_phi * 1e6)))
        for i, r in enumerate(order[: best_k + 1])
    ]
    id_type = "string" if isinstance(order[0][ID], str) else "bigint"
    return spark.createDataFrame(
        out, f"{ID} {id_type}, sweep_pos int, phi_millionths bigint"
    )


def local_cluster(
    graph: LinkGraph,
    seed_node,
    damping: float = 0.85,
    max_iter: int = 20,
    max_support: int = 100_000,
) -> DataFrame:
    """DataFrame[id, sweep_pos, phi_millionths] — the minimum-conductance
    sweep prefix around ``seed_node`` (module docstring). ``sweep_pos``
    is the node's 0-based position in the PPR sweep order;
    ``phi_millionths`` (constant across rows) is the achieved
    conductance."""
    from linkgraph.algorithms.pagerank import pagerank

    res = pagerank(
        graph,
        damping=damping,
        tol=0.0,
        max_iter=max_iter,
        personalization={seed_node: 1.0},
    )
    return sweep_cut(
        graph, res.ranks, score_col="pagerank", max_support=max_support
    )
