"""Heat-kernel diffusion + heat-kernel local clustering (Chung PNAS'07;
Kloster & Gleich, KDD'14 "Heat kernel based community detection").

NOT in the reference (mercury has no diffusion surface beyond PageRank);
the standard alternative to the PPR sweep: h = e^{-t} Σ_k (t^k/k!) P^k s
weights short walks more aggressively than PPR's geometric series, which
empirically recovers tighter seeded communities (Kloster-Gleich §5).

Spark-first shape — identical plan skeleton to the PageRank superstep:
the TRUNCATED Taylor series is a fixed number of supersteps, each ONE
exchange (edges persisted with 1/deg pre-attached and hash-partitioned
by ``src``; only the score table shuffles), with the Taylor weights
e^{-t} t^k/k! computed driver-side as exact float literals folded into
the plan. Lineage is truncated per superstep. The diffusion runs over
the UNDIRECTED simple view (least/greatest-distinct), matching the sweep
conductance's volume/degree convention so ``h/deg`` is well-defined.

Truncation: ``n_terms`` defaults to 20; at t=5 the dropped tail mass is
e^{-5} Σ_{k>20} 5^k/k! < 2e-7 — below the millionths resolution the
repo's oracles pin.

The sweep half is shared with the PPR variant
(:func:`linkgraph.algorithms.local_cluster.sweep_cut`).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph


def taylor_weights(t: float, n_terms: int) -> list:
    """[w_0 … w_{n_terms}] with w_k = e^{-t} t^k / k! (exact driver-side
    floats — both engines fold the same literals)."""
    w = [math.exp(-t)]
    for k in range(1, n_terms + 1):
        w.append(w[-1] * t / k)
    return w


def heat_kernel(
    graph: LinkGraph,
    seed_node,
    t: float = 5.0,
    n_terms: int = 20,
) -> DataFrame:
    """DataFrame[id, hk] — truncated heat-kernel diffusion values from
    ``seed_node`` over the undirected simple view; rows only where
    hk > 0 (the diffusion support)."""
    if t <= 0:
        raise ValueError(f"t must be > 0, got {t}")
    if n_terms < 1:
        raise ValueError(f"n_terms must be >= 1, got {n_terms}")
    w = taylor_weights(t, n_terms)

    und = (
        graph.edges.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(F.col("a").alias(SRC), F.col("b").alias(DST)).unionByName(
        und.select(F.col("b").alias(SRC), F.col("a").alias(DST))
    )
    deg = sym.groupBy(F.col(SRC).alias(ID)).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # 1/deg pre-attached once; supersteps shuffle only the score table
    msg = (
        sym.join(deg.select(F.col(ID).alias(SRC), "deg"), SRC)
        .select(SRC, DST, (F.lit(1.0) / F.col("deg")).alias("_invd"))
        .repartition(SRC)
        .persist()
    )
    try:
        spark = graph.edges.sparkSession
        state = spark.createDataFrame(
            [(seed_node, 1.0, w[0])], [ID, "_x", "hk"]
        )
        for k in range(1, n_terms + 1):
            contrib = (
                msg.join(
                    state.filter(F.col("_x") > 0).select(
                        F.col(ID).alias(SRC), "_x"
                    ),
                    SRC,
                )
                .groupBy(F.col(DST).alias(ID))
                .agg(F.sum(F.col("_x") * F.col("_invd")).alias("_cx"))
            )
            state = (
                state.select(ID, "hk")
                .join(contrib, ID, "full")
                .select(
                    ID,
                    F.coalesce("_cx", F.lit(0.0)).alias("_x"),
                    (
                        F.coalesce("hk", F.lit(0.0))
                        + F.lit(w[k]) * F.coalesce("_cx", F.lit(0.0))
                    ).alias("hk"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        msg.unpersist()
    return state.filter(F.col("hk") > 0).select(ID, "hk")


def heat_kernel_cluster(
    graph: LinkGraph,
    seed_node,
    t: float = 5.0,
    n_terms: int = 20,
    max_support: int = 100_000,
) -> DataFrame:
    """DataFrame[id, sweep_pos, phi_millionths] — minimum-conductance
    sweep prefix of the heat-kernel diffusion around ``seed_node``
    (sweep semantics: :func:`linkgraph.algorithms.local_cluster.sweep_cut`)."""
    from linkgraph.algorithms.local_cluster import sweep_cut

    hk = heat_kernel(graph, seed_node, t=t, n_terms=n_terms)
    return sweep_cut(graph, hk, score_col="hk", max_support=max_support)
