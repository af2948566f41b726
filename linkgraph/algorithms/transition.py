"""Markov transition matrix over a directed graph, distributed.

Same semantics as the reference's ``Transition``
(``mercury/graph/ml/transition.py:12-95``), which row-normalizes a dense
scipy adjacency on the driver: non-zero rows scaled to sum 1, zero rows
(dangling states) made recurrent via a self-loop of 1
(transition.py:53-62); k-step distribution via ``numpy.linalg.matrix_power``
(transition.py:90-93).

Here the matrix stays a sparse edge DataFrame (src, dst, prob):
- normalization is an edge-level window-free groupBy+join,
- dangling self-loops come from a left_anti join,
- T^k is computed by binary exponentiation with sparse matrix-multiply as
  join+groupBy (log2(k) multiplies — the reference's k=2000 test is 11
  multiplies, not 2000).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


def transition_matrix(graph: LinkGraph) -> DataFrame:
    """Row-stochastic transition matrix as DataFrame[src, dst, prob]."""
    w = graph.weight_col()
    e = graph.edges.select(SRC, DST, w.alias("w"))
    tot = e.groupBy(SRC).agg(F.sum("w").alias("_tot"))
    norm = e.join(tot, SRC).select(
        SRC, DST, (F.col("w") / F.col("_tot")).alias("prob")
    )
    # dangling (zero-row) states become recurrent: self-loop prob 1
    dangling = (
        graph.nodes.select(ID)
        .join(e.select(F.col(SRC).alias(ID)).distinct(), ID, "left_anti")
        .select(F.col(ID).alias(SRC), F.col(ID).alias(DST), F.lit(1.0).alias("prob"))
    )
    return norm.unionByName(dangling)


def _matmul(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sparse (src, dst, prob) × (src, dst, prob) matrix multiply."""
    return (
        a.select(F.col(SRC).alias("i"), F.col(DST).alias("k"), F.col("prob").alias("pa"))
        .join(
            b.select(F.col(SRC).alias("k"), F.col(DST).alias("j"), F.col("prob").alias("pb")),
            "k",
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("pa") * F.col("pb")).alias("prob"))
        .select(F.col("i").alias(SRC), F.col("j").alias(DST), "prob")
    )


def transition_power(tm: DataFrame, k: int) -> DataFrame:
    """T^k by binary exponentiation (k ≥ 1)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    with static_plans(tm.sparkSession):
        result = None
        base = tm.localCheckpoint(eager=True)
        while k > 0:
            if k & 1:
                result = base if result is None else _matmul(result, base).localCheckpoint(eager=True)
            k >>= 1
            if k:
                base = _matmul(base, base).localCheckpoint(eager=True)
        return result


def sinkhorn_normalize(
    graph: LinkGraph, iterations: int = 10, checkpoint_every: int = 4
) -> DataFrame:
    """Sinkhorn–Knopp doubly-stochastic normalization of the weighted
    adjacency: alternate row- and column-sum rescaling for ``iterations``
    full rounds, returning DataFrame[src, dst, weight] whose row sums are
    exactly 1 (the row pass runs last... see below) and whose column sums
    converge to 1 geometrically when the support admits a doubly
    stochastic scaling (Sinkhorn'64; total-support condition — for
    bipartite-blocked or zero-line supports the iteration oscillates, as
    in the dense case).

    Used for graph-matching/optimal-transport style normalization and as
    a symmetric alternative to the row-stochastic
    :func:`transition_matrix`. Convention: each round = one COLUMN pass
    then one ROW pass, so the returned matrix is exactly row-stochastic
    and approximately column-stochastic (the standard "last pass wins"
    asymmetry, stated rather than hidden).

    Scale notes: each pass is one algebraic groupBy + one join keyed on
    that pass's side — the same budget class as ``transition_matrix``
    twice per round; lineage cut every ``checkpoint_every`` rounds.
    Weights must be positive; zero/negative raise."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = graph.weight_col()
    e = graph.edges.select(SRC, DST, w.alias("weight"))
    if e.filter(F.col("weight") <= 0).limit(1).count() > 0:
        raise ValueError("sinkhorn_normalize needs strictly positive weights")
    for i in range(iterations):
        ctot = e.groupBy(DST).agg(F.sum("weight").alias("_ct"))
        e = e.join(ctot, DST).select(
            SRC, DST, (F.col("weight") / F.col("_ct")).alias("weight")
        )
        rtot = e.groupBy(SRC).agg(F.sum("weight").alias("_rt"))
        e = e.join(rtot, SRC).select(
            SRC, DST, (F.col("weight") / F.col("_rt")).alias("weight")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            e = e.localCheckpoint(eager=True)
    return e
