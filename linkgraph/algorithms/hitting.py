"""Hitting times and absorption probabilities to a target node set.

Markov-chain first-passage queries over the same row-stochastic transition
matrix as :mod:`linkgraph.algorithms.transition` (reference semantics for
the chain itself: ``mercury/graph/ml/transition.py:53-62`` — weights
row-normalized, dangling states recurrent via self-loop; the reference has
no first-passage operators, this extends the family).

- ``hitting_times``: h(v) = expected steps to FIRST reach any target,
  the fixpoint of h(t)=0, h(v) = 1 + Σ_u P(v,u)·h(u). Iterating from
  h≡0 gives the truncated expectation E[min(T, k)] after k supersteps —
  monotone non-decreasing, converging exactly where the target is reached
  with probability 1. Nodes that CANNOT reach a target drift upward by
  ~1 per step and never converge: detect them with
  ``absorption_probabilities`` (< 1) before trusting their h.
- ``absorption_probabilities``: a(v) = P(chain from v ever reaches a
  target), fixpoint of a(t)=1, a(v) = Σ_u P(v,u)·a(u) from a≡target
  indicator; monotone non-decreasing in [0, 1].

Scale shape: each superstep is ONE join of the edge-sized transition
matrix against the node-sized value table plus one algebraic groupBy —
the same exchange-per-superstep budget as PageRank; no window, no
driver-side rows beyond the scalar convergence delta. ``tol=0.0`` runs
exactly ``max_iter`` supersteps (the SQL-unrollable mode the oracles
replay, as pagerank's)."""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans
from linkgraph.algorithms.transition import transition_matrix


class FirstPassageResult(NamedTuple):
    values: DataFrame
    iterations: int
    converged: bool


def _targets_df(spark, graph, targets):
    if isinstance(targets, DataFrame):
        return targets.select(ID)
    if not targets:
        raise ValueError("targets must be non-empty")
    return spark.createDataFrame([(t,) for t in targets], [ID])


def _first_passage(graph, targets, max_iter, tol, mode):
    spark = graph.edges.sparkSession
    tgt = _targets_df(spark, graph, targets)
    with static_plans(spark):
        # the superstep joins tm on DST: pre-partition + pin so only the
        # node-sized value table exchanges per round
        from linkgraph.session import shuffle_partitions

        npart = shuffle_partitions(spark)  # 'auto'-proof (ADVICE r5)
        tm = pin_partitioned(transition_matrix(graph).repartition(npart, DST))
        init = F.lit(1.0) if mode == "absorb" else F.lit(0.0)
        v = (
            graph.nodes.select(ID)
            .join(tgt.withColumn("_t", F.lit(True)), ID, "left")
            .select(
                ID,
                F.coalesce("_t", F.lit(False)).alias("_t"),
                F.when(F.col("_t"), init).otherwise(F.lit(0.0)).alias("val"),
            )
            .localCheckpoint(eager=True)
        )
        base = F.lit(1.0) if mode == "hit" else F.lit(0.0)
        it, converged = 0, False
        for it in range(1, max_iter + 1):
            msg = (
                tm.join(
                    # shuffle_hash: build the node-sized value table,
                    # stream the pinned transition matrix (guide §3.1)
                    v.select(F.col(ID).alias(DST), F.col("val").alias("_hv")).hint(
                        "shuffle_hash"
                    ),
                    DST,
                )
                .groupBy(SRC)
                .agg((base + F.sum(F.col("prob") * F.col("_hv"))).alias("_new"))
            )
            # ONE materialization per superstep (r5: the old shape
            # checkpointed nv and then checkpointed a projection of it
            # AGAIN — two full state passes per round, the profiled gap
            # vs pagerank's ~1 s/superstep on the same corpus); the
            # previous value rides along as _prev so the convergence
            # delta is a pure scan of this round's own output, exactly
            # pagerank's convergence-stats shape
            nv = (
                v.select(ID, "_t", F.col("val").alias("_prev"))
                .join(msg.select(F.col(SRC).alias(ID), "_new"), ID, "left")
                .select(
                    ID,
                    "_t",
                    "_prev",
                    F.when(F.col("_t"), F.when(F.lit(mode == "absorb"), 1.0).otherwise(0.0))
                    .otherwise(F.coalesce("_new", F.lit(0.0) + base))
                    .alias("val"),
                )
                .localCheckpoint(eager=True)
            )
            if tol > 0.0:
                delta = nv.agg(
                    F.max(F.abs(F.col("val") - F.col("_prev")))
                ).collect()[0][0]
            v = nv.select(ID, "_t", "val")  # narrow view over the checkpoint
            if tol > 0.0 and delta is not None and delta <= tol:
                converged = True
                break
        tm.unpersist()
        name = "hitting_time" if mode == "hit" else "absorption_prob"
        return FirstPassageResult(v.select(ID, F.col("val").alias(name)), it, converged)


def hitting_times(
    graph: LinkGraph, targets, max_iter: int = 100, tol: float = 1e-9
) -> FirstPassageResult:
    """Expected first-passage time to the target set —
    ``FirstPassageResult(values=[id, hitting_time], iterations, converged)``.
    With ``tol=0.0`` runs exactly ``max_iter`` supersteps (truncated
    expectation E[min(T, max_iter)], digit-replayable in SQL)."""
    return _first_passage(graph, targets, max_iter, tol, "hit")


def absorption_probabilities(
    graph: LinkGraph, targets, max_iter: int = 100, tol: float = 1e-9
) -> FirstPassageResult:
    """Probability of ever reaching the target set —
    ``FirstPassageResult(values=[id, absorption_prob], iterations,
    converged)``; use to gate :func:`hitting_times` (h is only finite
    where this is 1)."""
    return _first_passage(graph, targets, max_iter, tol, "absorb")
