"""Katz centrality and HITS (hubs/authorities) — sparse power iterations.

NOT present in the reference (its centralities stop at closeness /
betweenness / pagerank, all networkx-delegated:
``mercury/graph/core/graph.py:627-690``); added because a link-analysis
engine without the other two classic link-analysis scores (Katz's
attenuated-path count, Kleinberg's HITS) sends ranking workloads back to
the user. Semantics match ``networkx.katz_centrality`` / ``networkx.hits``.

Distributed plan (same shape as pagerank, ``pagerank.py``): edges are
aggregated once to (u, v, w) adjacency weights, hash-partitioned on the
join key and persisted — every superstep joins the (small) score table
against the stationary edge table, so only scores shuffle. Per-superstep
actions: Katz reads its L1 delta and L2 norm from ONE aggregate over
(new ⋈ old); HITS needs two (max(h') for the scale-invariant
normalization, then the delta) — documented cost of networkx's
per-iteration max-normalization parity. HITS exploits that max-scaling
cancels through the bilinear a/h updates: the authority max-normalization
is algebraically folded away (h' = A·Aᵀ·h up to a scalar), halving the
join count per superstep versus the textbook two-normalization loop.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def _adjacency(graph: LinkGraph, key: str) -> DataFrame:
    """(u, v, w) with parallel edges summed (adjacency-matrix semantics,
    matching networkx MultiGraph weight accumulation), hash-partitioned on
    ``key`` and PINNED via ``session.pin_partitioned`` so the partitioning
    stays visible to Catalyst across supersteps (a localCheckpoint would
    degrade to an unknown-partitioning scan and re-exchange the edge table
    every round). Caller unpersists."""
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return pin_partitioned(
        graph.edges.select(
            F.col(SRC).alias("u"),
            F.col(DST).alias("v"),
            graph.weight_col().alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .repartition(npart, key)
    )


def katz_centrality(
    graph: LinkGraph,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-6,
    normalized: bool = True,
) -> DataFrame:
    """DataFrame[id, katz] — x'(v) = α·Σ_{u→v} w(u,v)·x(u) + β iterated from
    x=0, converged when Σ|x'−x| < N·tol, then L2-normalized (networkx
    ``katz_centrality`` semantics exactly, including the N-scaled
    tolerance). ``tol<=0`` runs exactly ``max_iter`` supersteps with no
    convergence check — the fixed-step form the SQL oracles unroll.

    α must satisfy α < 1/λ_max(A) for convergence (caller's contract, as in
    networkx); divergence surfaces as non-convergence at ``max_iter``.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    spark = graph.edges.sparkSession
    n = graph.number_of_nodes()
    with static_plans(spark):
        edges = _adjacency(graph, "u")
        nodes = graph.nodes.select(ID).localCheckpoint(eager=True)
        x = nodes.select(ID, F.lit(0.0).alias("x"))
        err = sumsq = float("nan")
        for _ in range(max_iter):
            contrib = (
                x.hint("shuffle_hash").join(edges, x[ID] == edges["u"])
                .select(edges["v"].alias(ID), (F.col("x") * F.col("w")).alias("c"))
                .groupBy(ID)
                .agg(F.sum("c").alias("c"))
            )
            newx = nodes.join(contrib, ID, "left").select(
                ID,
                (
                    F.lit(alpha) * F.coalesce("c", F.lit(0.0)) + F.lit(beta)
                ).alias("x"),
            )
            newx = newx.localCheckpoint(eager=False)
            # one action: L1 delta + L2 norm from the same pass
            row = (
                newx.join(x.select(ID, F.col("x").alias("_xl")), ID)
                .agg(
                    F.sum(F.abs(F.col("x") - F.col("_xl"))).alias("err"),
                    F.sum(F.col("x") * F.col("x")).alias("ss"),
                )
                .first()
            )
            err, sumsq = float(row["err"]), float(row["ss"])
            x = newx
            if not math.isfinite(err):
                # overflow to inf/nan: diverging NOW — don't burn the
                # remaining superstep budget on poisoned floats
                edges.unpersist()
                raise RuntimeError(
                    "katz_centrality diverged (non-finite L1 delta); "
                    "alpha exceeds 1/lambda_max(A) — reduce alpha "
                    "(weighted graphs: lambda_max scales with weighted "
                    "degree, not edge count)"
                )
            if tol > 0 and err < n * tol:
                break
        else:
            if tol > 0:
                edges.unpersist()
                raise RuntimeError(
                    f"katz_centrality did not converge within max_iter="
                    f"{max_iter} (L1 delta {err:.3g} >= {n * tol:.3g}); "
                    "check alpha < 1/lambda_max(A)"
                )
        edges.unpersist()
    if normalized:
        s = 1.0 / math.sqrt(sumsq) if sumsq > 0 else 1.0
        x = x.select(ID, (F.col("x") * F.lit(s)).alias("katz"))
    else:
        x = x.select(ID, F.col("x").alias("katz"))
    return x


def hits(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-8,
    normalized: bool = True,
) -> DataFrame:
    """DataFrame[id, hub, authority] — Kleinberg's HITS with networkx
    ``hits`` semantics: h starts uniform 1/N; each superstep computes
    a = Aᵀh then h' = A·a, max-normalizes h', and converges when
    Σ|h'−h| < tol; outputs are L1-normalized (``normalized=True``).
    ``tol<=0`` runs exactly ``max_iter`` supersteps (the oracle form).

    The per-iteration authority max-normalization of the textbook loop is
    scale-invariant through the final L1 normalization, so it is folded
    away: per superstep one a-join, one h-join, one max action, one delta
    action. Nodes with no in-edges get authority 0, no out-edges hub 0
    (sparse state, zero-filled at output), as in networkx.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    spark = graph.edges.sparkSession
    n = graph.number_of_nodes()
    with static_plans(spark):
        fwd = _adjacency(graph, "u")  # a(v) += h(u)·w : join h on u
        rev = _adjacency(graph, "v")  # h(u) += a(v)·w : join a on v
        h = graph.nodes.select(ID, F.lit(1.0 / n).alias("h")).localCheckpoint(
            eager=True
        )
        a_un = None
        converged = False
        for _ in range(max_iter):
            a_un = (
                h.hint("shuffle_hash").join(fwd, h[ID] == fwd["u"])
                .select(fwd["v"].alias(ID), (F.col("h") * F.col("w")).alias("a"))
                .groupBy(ID)
                .agg(F.sum("a").alias("a"))
                .localCheckpoint(eager=False)
            )
            h_un = (
                a_un.hint("shuffle_hash").join(rev, a_un[ID] == rev["v"])
                .select(rev["u"].alias(ID), (F.col("a") * F.col("w")).alias("hn"))
                .groupBy(ID)
                .agg(F.sum("hn").alias("hn"))
                .localCheckpoint(eager=False)
            )
            m = h_un.agg(F.max("hn")).first()[0]
            if m is None or m <= 0:
                # no hub mass anywhere (edge-free graph): fixpoint of zeros
                h = h.select(ID, F.lit(0.0).alias("h"))
                converged = True
                break
            newh = h_un.select(ID, (F.col("hn") / F.lit(float(m))).alias("h"))
            err = float(
                newh.join(h.select(ID, F.col("h").alias("_hl")), ID, "full")
                .agg(
                    F.sum(
                        F.abs(
                            F.coalesce("h", F.lit(0.0))
                            - F.coalesce("_hl", F.lit(0.0))
                        )
                    ).alias("e")
                )
                .first()["e"]
            )
            h = newh.localCheckpoint(eager=False)
            if tol > 0 and err < tol:
                converged = True
                break
        if tol > 0 and not converged:
            fwd.unpersist()
            rev.unpersist()
            raise RuntimeError(
                f"hits did not converge within max_iter={max_iter}"
            )
        fwd.unpersist()
        rev.unpersist()
        out = (
            graph.nodes.select(ID)
            .join(h, ID, "left")
            .join(a_un, ID, "left")
            .select(
                ID,
                F.coalesce("h", F.lit(0.0)).alias("hub"),
                F.coalesce("a", F.lit(0.0)).alias("authority"),
            )
        )
        if normalized:
            sums = out.agg(
                F.sum("hub").alias("sh"), F.sum("authority").alias("sa")
            ).first()
            sh = float(sums["sh"] or 0.0) or 1.0
            sa = float(sums["sa"] or 0.0) or 1.0
            out = out.select(
                ID,
                (F.col("hub") / F.lit(sh)).alias("hub"),
                (F.col("authority") / F.lit(sa)).alias("authority"),
            )
    return out


def eigenvector_centrality(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-6,
) -> DataFrame:
    """DataFrame[id, eigenvector] — eigenvector centrality with networkx
    ``eigenvector_centrality`` semantics exactly: start uniform 1/N,
    iterate x' = (A + I)ᵀ·x (the +I shift damps bipartite oscillation,
    as in networkx), L2-normalize every step, converge when
    Σ|x'−x| < N·tol. ``tol<=0`` runs exactly ``max_iter`` supersteps —
    the fixed-step form the SQL oracle unrolls. Directed graphs score by
    in-edges (u→v contributes x(u)·w to v), networkx's convention.

    Same distributed shape as katz (one score⋈edges join + one algebraic
    groupBy per superstep against the once-partitioned adjacency); the
    per-step normalization needs the L2 action before the scale is known,
    so a convergence check costs a second scalar action — the HITS trade,
    documented there.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    spark = graph.edges.sparkSession
    n = graph.number_of_nodes()
    if n == 0:
        return graph.nodes.select(ID, F.lit(0.0).alias("eigenvector"))
    with static_plans(spark):
        edges = _adjacency(graph, "u")
        nodes = graph.nodes.select(ID).localCheckpoint(eager=True)
        x = nodes.select(ID, F.lit(1.0 / n).alias("x"))
        converged = tol <= 0
        for _ in range(max_iter):
            contrib = (
                x.hint("shuffle_hash").join(edges, x[ID] == edges["u"])
                .select(edges["v"].alias(ID), (F.col("x") * F.col("w")).alias("c"))
                .groupBy(ID)
                .agg(F.sum("c").alias("c"))
            )
            raw = (
                x.join(contrib, ID, "left")
                .select(ID, (F.col("x") + F.coalesce("c", F.lit(0.0))).alias("x"))
                .localCheckpoint(eager=False)
            )
            ss = float(raw.agg(F.sum(F.col("x") * F.col("x"))).first()[0])
            if not math.isfinite(ss):
                edges.unpersist()
                raise RuntimeError(
                    "eigenvector_centrality overflowed (non-finite L2 norm); "
                    "weights too large for per-step normalization to track"
                )
            s = math.sqrt(ss) if ss > 0 else 1.0
            newx = raw.select(ID, (F.col("x") / F.lit(s)).alias("x"))
            if tol > 0:
                err = float(
                    newx.join(x.select(ID, F.col("x").alias("_xl")), ID)
                    .agg(F.sum(F.abs(F.col("x") - F.col("_xl"))).alias("e"))
                    .first()["e"]
                )
                x = newx.localCheckpoint(eager=False)
                if err < n * tol:
                    converged = True
                    break
            else:
                x = newx.localCheckpoint(eager=False)
        edges.unpersist()
        if not converged:
            raise RuntimeError(
                f"eigenvector_centrality did not converge within "
                f"max_iter={max_iter} (networkx raises PowerIterationFailed"
                f"Convergence here too)"
            )
    return x.select(ID, F.col("x").alias("eigenvector"))
