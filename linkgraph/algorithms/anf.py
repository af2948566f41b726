"""Neighborhood function + effective diameter — HyperANF on HLL sketches.

NOT present in the reference (its only distance summaries are
networkx-delegated closeness/diameter on collected graphs,
``mercury/graph/core/graph.py:627-690``); added because the neighborhood
function N(r) = Σ_v |ball(v, r)| is THE scalable way to read a graph's
distance distribution (hop plot, effective diameter, median distance) —
exact all-pairs BFS is O(V²) state and dead at scale.

Method ``"hll"`` is HyperANF (Boldi-Rosa-Vigna, WWW 2011) expressed
entirely in JVM aggregates: per-node reached-set state is a DataSketches
HLL sketch (``hll_sketch_agg``), and the superstep

    ball'(v) = ball(v) ∪ ⋃_{v→u} ball(u)

is one join + one ``hll_union_agg`` groupBy — algebraic, map-side
combinable, no Python in the loop. State per node is O(2^lg_k) bytes
REGARDLESS of ball size, so the plan survives 100-TB graphs where the
exact pair-state explodes. Estimates are exact while sketches are in
sparse mode (small balls), ~1.04/√2^lg_k relative error beyond.

Method ``"exact"`` materializes (v, reached) pairs with a distinct per
superstep — the verification path (and the oracle path), honest about its
O(Σ ball sizes) state.

Both stop as soon as N(r) stops growing (every ball closed), else at
``max_hops``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


def neighborhood_function(
    graph: LinkGraph,
    max_hops: int = 32,
    method: str = "hll",
    lg_k: int = 12,
) -> DataFrame:
    """DataFrame[hop, pairs] — pairs(r) = Σ_v |{u : dist(v,u) ≤ r}| for
    hop = 0..R, where R is ``max_hops`` or the first hop with no growth
    (whichever is smaller; the stable duplicate row is not emitted).
    Distances follow edge direction (undirected graphs already materialize
    both directions). hop 0 is always the node count.

    ``method="hll"``: HyperANF, approximate beyond sparse-mode
    cardinalities, bounded state — the scale path. ``method="exact"``:
    exact pair materialization — the verification path.
    """
    if method not in ("hll", "exact"):
        raise ValueError(f"unknown method {method!r} (hll|exact)")
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        # persist, not localCheckpoint: a cached plan keeps its
        # repartition(v) partitioning visible to Catalyst (an RDD
        # checkpoint degrades to unknown partitioning and re-exchanges
        # the EDGE side every hop — the node-sized state is the only
        # side that should ever shuffle)
        edges = (
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .distinct()
            .repartition(npart, "v")  # superstep joins state on the DST side
            .persist()
        )
        edges.count()  # materialize once
        if method == "hll":
            state = (
                graph.nodes.groupBy(ID)
                .agg(F.hll_sketch_agg(ID, F.lit(lg_k)).alias("sk"))
                .localCheckpoint(eager=True)
            )
            est = F.sum(F.hll_sketch_estimate("sk"))
        else:
            state = graph.nodes.select(
                F.col(ID), F.col(ID).alias("_u")
            ).localCheckpoint(eager=True)
            est = F.count(F.lit(1))
        history = [int(state.agg(est.alias("n")).first()["n"])]
        for _ in range(max_hops):
            if method == "hll":
                contrib = state.join(edges, state[ID] == edges["v"]).select(
                    edges["u"].alias(ID), "sk"
                )
                state_n = (
                    state.select(ID, "sk")
                    .unionByName(contrib)
                    .groupBy(ID)
                    .agg(F.hll_union_agg("sk").alias("sk"))
                )
            else:
                contrib = state.join(edges, state[ID] == edges["v"]).select(
                    edges["u"].alias(ID), "_u"
                )
                state_n = state.unionByName(contrib).distinct()
            # KEEP the explicit repartition + eager checkpoint (the r5
            # form): the r6 optimization pass tried dropping the
            # repartition and fusing the checkpoint into the estimate
            # action, and interleaved A/B legs at 2.3M edges could not
            # separate either variant from host noise (walls swung 22-65 s
            # across legs for BOTH trees), so the proven shape stays.
            state_n = state_n.repartition(npart, ID).localCheckpoint(eager=True)
            n = int(state_n.agg(est.alias("n")).first()["n"])
            state = state_n
            if n == history[-1]:
                break  # every ball closed (or estimates stable): converged
            history.append(n)
        edges.unpersist()
    return spark.createDataFrame(
        [(h, n) for h, n in enumerate(history)], "hop int, pairs long"
    ).repartition(1)


def hyperball_harmonic(
    graph: LinkGraph,
    max_hops: int = 32,
    method: str = "hll",
    lg_k: int = 12,
) -> DataFrame:
    """Per-node harmonic centrality via HyperBall (Boldi & Vigna, "In-core
    computation of geometric centralities with HyperBall", 2013) —
    DataFrame[id, harmonic] with

        harmonic(v) = Σ_h (|ball(v, h)| − |ball(v, h−1)|) / h
                    = Σ_{u reachable from v, u≠v} 1 / dist(v, u)

    the same quantity :func:`linkgraph.algorithms.closeness.harmonic_centrality`
    computes by landmark BFS — but with O(2^lg_k) state per node regardless
    of ball size, so it scales to graphs where even landmark distance tables
    blow up. Estimates are exact while sketches are in sparse mode; beyond
    that the per-hop delta is clamped at 0 so estimator wobble never
    subtracts mass.

    Superstep shape (audited — tests/test_plans.py): the running
    (est, harmonic) columns ride THROUGH the ``hll_union_agg`` groupBy as
    null-on-the-contrib-branch max() aggregates, so there is NO carry join;
    edges are ``persist()``-ed (a cached plan keeps its ``repartition(v)``
    partitioning visible to Catalyst, where ``localCheckpoint`` would
    degrade to an unknown-partitioning RDD scan and force an edge-sized
    exchange EVERY hop) — per hop that leaves exactly two node-sized
    exchanges (state into the edge join, union into the groupBy) and one
    action; stops when ΣN(r) stops growing.

    ``method="exact"`` runs the same accumulation on materialized
    (node, reached) pairs — the verification path, equal to
    ``harmonic_centrality(graph)`` by construction.
    """
    if method not in ("hll", "exact"):
        raise ValueError(f"unknown method {method!r} (hll|exact)")
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        edges = (
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .distinct()
            .repartition(npart, "v")
            .persist()
        )
        edges.count()  # materialize once
        if method == "hll":
            # groupBy(ID) already leaves the state hash(id)-partitioned —
            # no explicit repartition needed before the first hop
            state = (
                graph.nodes.groupBy(ID)
                .agg(F.hll_sketch_agg(ID, F.lit(lg_k)).alias("sk"))
                .select(
                    ID,
                    "sk",
                    F.hll_sketch_estimate("sk").alias("est"),
                    F.lit(0.0).alias("harmonic"),
                )
                .localCheckpoint(eager=True)
            )
        else:
            state = (
                graph.nodes.select(F.col(ID), F.col(ID).alias("_u"))
                .repartition(npart, ID)
                .localCheckpoint(eager=True)
            )
            carry = graph.nodes.select(
                ID, F.lit(1.0).alias("est"), F.lit(0.0).alias("harmonic")
            ).repartition(npart, ID).localCheckpoint(eager=True)
        total = float(
            (state if method == "hll" else carry).agg(F.sum("est")).first()[0]
        )
        for hop in range(1, max_hops + 1):
            if method == "hll":
                contrib = state.join(edges, state[ID] == edges["v"]).select(
                    edges["u"].alias(ID),
                    "sk",
                    F.lit(None).cast("double").alias("est"),
                    F.lit(None).cast("double").alias("harmonic"),
                )
                # carry (est, harmonic) THROUGH the aggregate: each id has
                # exactly one state row (non-null) and N contrib rows
                # (null), so max() recovers the carried values — no join.
                # Per-hop delta clamped at 0 (sketch estimates can wobble).
                grown = (
                    state.select(ID, "sk", "est", "harmonic")
                    .unionByName(contrib)
                    .groupBy(ID)
                    .agg(
                        F.hll_union_agg("sk").alias("sk"),
                        F.max("est").alias("_e0"),
                        F.max("harmonic").alias("_h0"),
                    )
                    .withColumn("_est", F.hll_sketch_estimate("sk"))
                )
                state_n = grown.select(
                    ID,
                    "sk",
                    F.col("_est").alias("est"),
                    (
                        F.col("_h0")
                        + F.greatest(F.col("_est") - F.col("_e0"), F.lit(0.0))
                        / F.lit(float(hop))
                    ).alias("harmonic"),
                )
            else:
                contrib = state.join(edges, state[ID] == edges["v"]).select(
                    edges["u"].alias(ID), "_u"
                )
                pairs = state.select(ID, "_u").unionByName(contrib).distinct()
                state_n = pairs.repartition(npart, ID).localCheckpoint(eager=True)
                cnt = state_n.groupBy(ID).agg(
                    F.count(F.lit(1)).cast("double").alias("_est")
                )
                carry = (
                    cnt.join(carry, ID)
                    .select(
                        ID,
                        F.col("_est").alias("est"),
                        (
                            F.col("harmonic")
                            + F.greatest(F.col("_est") - F.col("est"), F.lit(0.0))
                            / F.lit(float(hop))
                        ).alias("harmonic"),
                    )
                    .repartition(npart, ID)
                    .localCheckpoint(eager=True)
                )
            if method == "hll":
                # join output is already hash(id)-partitioned (see init);
                # eager=True deliberately (same A/B note as
                # neighborhood_function: the lazy variant was not
                # separable from host noise, keep the proven shape)
                state_n = state_n.localCheckpoint(eager=True)
                new_total = float(state_n.agg(F.sum("est")).first()[0])
                state = state_n
            else:
                new_total = float(carry.agg(F.sum("est")).first()[0])
                state = state_n
            if new_total == total:
                break
            total = new_total
        edges.unpersist()
        out = state if method == "hll" else carry
        return out.select(ID, "harmonic")


def effective_diameter(
    graph: LinkGraph,
    fraction: float = 0.9,
    max_hops: int = 64,
    method: str = "hll",
    lg_k: int = 12,
) -> int:
    """Smallest integer r with N(r) ≥ fraction · N(R), R the last computed
    hop (the standard integer effective diameter; fraction=1.0 gives the
    reachability diameter of the ball expansion). N is tiny (one row per
    hop), so the selection is driver-side arithmetic."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError("fraction must be in (0, 1]")
    nf = neighborhood_function(graph, max_hops=max_hops, method=method, lg_k=lg_k)
    rows = sorted((r["hop"], r["pairs"]) for r in nf.collect())
    total = rows[-1][1]
    for hop, pairs in rows:
        if pairs >= fraction * total:
            return hop
    return rows[-1][0]
