"""k-core decomposition — iterative peeling on DataFrame ops, from scratch.

NOT present in the reference (no core/degeneracy code under ``mercury/``);
added as engine surface a link-graph user needs (spam/bot-farm detection,
dense-subgraph seeds for community finding, crawl prioritization).

Semantics (standard, networkx ``k_core``/``core_number`` parity on the
undirected simple graph): the k-core is the maximal subgraph in which every
node has degree >= k; ``core_number(v)`` is the largest k such that v is in
the k-core. Self-loops are dropped; direction is ignored; parallel edges
count once.

Scale design:
- One peel round = one algebraic ``groupBy(node).count()`` + two semi-joins
  — no windows, map-side combine bounds hub fan-in, AQE-free static plans
  inside the loop (the superstep shape every other iterative operator here
  uses).
- Convergence via the surviving-edge count: the peeling fixpoint is reached
  when no round removes an edge. One count action per round against the
  localCheckpoint'd pair table (lineage stays flat).
- ``core_number`` runs peel phases k = 1, 2, ... until the graph empties;
  nodes removed in phase k get core number k-1. Total supersteps are
  O(degeneracy x peel-rounds) — the honest cost of exact core numbers; real
  link graphs have degeneracy in the tens-to-hundreds, and each phase
  shrinks the edge set monotonically so later phases run on a fraction of
  the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import PinnedGenerations, static_plans


def _undirected_pairs(graph: LinkGraph) -> DataFrame:
    """Distinct undirected (u, v) pairs, both orientations, no self-loops.
    Keeping both orientations makes the per-round degree a single
    groupBy('u') — no union inside the loop."""
    e = graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _peel(pairs: DataFrame, k: int, max_iter: int) -> DataFrame:
    """Peel nodes with degree < k to fixpoint; returns surviving pairs.
    ``pairs`` must be symmetric (both orientations present) — peeling
    preserves symmetry, since u and v drop together or not at all.

    Each round's survivor set is a pinned generation hash(u)-partitioned
    (session.PinnedGenerations): the round's degree groupBy and u-side
    semi-join then run exchange-free on the cached layout — only the
    node-sized keep set and the v-side semi-join shuffle. The returned
    generation stays pinned for the caller's follow-on scans; peeling it
    again (core_number's phases) releases it via the next pin."""
    npart = int(
        pairs.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    gens = PinnedGenerations()
    pairs = gens.pin(pairs.repartition(npart, "u"))
    n_pairs = pairs.count()
    for _ in range(max_iter):
        if n_pairs == 0:
            break
        keep = (
            pairs.groupBy("u")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") >= k)
            .select("u")
        )
        # v-side semi first, u-side LAST: the final shuffle-hash semi-join
        # (build = node-sized keep set, guide §3.1) leaves the survivors
        # hash(u)-partitioned at npart — the layout the pin needs — so the
        # explicit repartition (a full edge-sized exchange per round) goes
        # away; the hint also keeps the planner off sort-merge, which would
        # sort the pair table twice per round
        nxt = gens.pin(
            pairs.join(
                keep.select(F.col("u").alias("v")).hint("shuffle_hash"),
                "v",
                "left_semi",
            )
            .join(keep.hint("shuffle_hash"), "u", "left_semi")
            .select("u", "v")
        )
        n_next = nxt.count()
        if n_next == n_pairs:
            break
        pairs, n_pairs = nxt, n_next
    # hand the live generation to the caller WITHOUT releasing it: sever
    # the result from the cache so the caller can't observe an unpersisted
    # plan, then release
    out = pairs.localCheckpoint(eager=True)
    gens.release()
    return out


def k_core(graph: LinkGraph, k: int, max_iter: int = 10_000) -> DataFrame:
    """DataFrame[id] — the nodes of the k-core (maximal subgraph with all
    degrees >= k). k=0 returns all nodes; k=1 returns all non-isolated
    nodes (plus nothing else — isolated nodes have degree 0)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    if k == 0:
        return graph.nodes.select(ID)
    with static_plans(graph.edges.sparkSession):
        survivors = _peel(_undirected_pairs(graph), k, max_iter)
        return survivors.select(F.col("u").alias(ID)).distinct()


def core_number(graph: LinkGraph, max_iter: int = 10_000) -> DataFrame:
    """DataFrame[id, core] — exact core number per node (networkx
    ``core_number`` parity). Isolated nodes get core 0."""
    with static_plans(graph.edges.sparkSession):
        pairs = _undirected_pairs(graph)
        # nodes never seen in any edge are core 0 by definition
        result = graph.nodes.select(ID).join(
            pairs.select(F.col("u").alias(ID)).distinct(), ID, "left_anti"
        ).select(ID, F.lit(0).alias("core"))
        results = [result.localCheckpoint(eager=True)]
        alive = pairs.select(F.col("u").alias(ID)).distinct().localCheckpoint(
            eager=True
        )
        k = 1
        while alive.limit(1).count() > 0:
            pairs = _peel(pairs, k + 1, max_iter)
            surv = pairs.select(F.col("u").alias(ID)).distinct().localCheckpoint(
                eager=True
            )
            # removed during phase k+1 => degree bound k held: core = k
            removed = alive.join(surv, ID, "left_anti").select(
                ID, F.lit(k).alias("core")
            )
            results.append(removed.localCheckpoint(eager=True))
            alive = surv
            k += 1
        out = results[0]
        for r in results[1:]:
            out = out.unionByName(r)
        return out


def onion_layers(graph: LinkGraph, max_iter: int = 100_000) -> DataFrame:
    """DataFrame[id, layer] — onion decomposition (Hébert-Dufresne, Grochow
    & Allard 2016; networkx ``onion_layers`` parity): layer L removes, in
    one batch, every node whose CURRENT degree is ≤ the running core bound
    (the bound ratchets up to the minimum remaining degree), refining the
    k-core decomposition into the peeling order itself — the standard
    core-periphery profile. Isolated nodes form layer 1.

    One layer = one algebraic degree aggregate + a scalar min-degree read
    + two semi-joins removing the batch (the k-core peel shape). Rounds =
    number of onion layers: tens on heavy-tailed graphs (degeneracy-
    bounded per core), O(n) only on adversarial chains — the same bound
    networkx pays, just superstep-priced; lineage truncates per layer."""
    spark = graph.edges.sparkSession
    with static_plans(spark):
        pairs = _undirected_pairs(graph).localCheckpoint(eager=True)
        iso = (
            graph.nodes.select(ID)
            .join(pairs.select(F.col("u").alias(ID)).distinct(), ID, "left_anti")
            .select(ID, F.lit(1).alias("layer"))
            .localCheckpoint(eager=True)
        )
        results = [iso]
        layer = 2 if iso.limit(1).count() > 0 else 1
        current_core = 1
        # alive tracks un-layered nodes explicitly: a node whose last
        # neighbor was peeled drops out of `pairs` at degree 0 but still
        # owes a layer (networkx keeps it in `degrees` with value 0)
        alive = (
            pairs.select(F.col("u").alias(ID)).distinct().localCheckpoint(
                eager=True
            )
        )
        for _ in range(max_iter):
            if alive.limit(1).count() == 0:
                break
            deg = pairs.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
            deg_all = alive.join(
                deg.select(F.col("u").alias(ID), "_d"), ID, "left"
            ).select(ID, F.coalesce("_d", F.lit(0)).alias("_d"))
            row = deg_all.agg(F.min("_d").alias("_m")).collect()[0]
            current_core = max(current_core, int(row["_m"]))
            batch = deg_all.filter(F.col("_d") <= current_core).select(ID)
            results.append(
                batch.select(ID, F.lit(layer).alias("layer")).localCheckpoint(
                    eager=True
                )
            )
            alive = alive.join(batch, ID, "left_anti").localCheckpoint(eager=True)
            pairs = (
                pairs.join(batch.select(F.col(ID).alias("u")), "u", "left_anti")
                .join(batch.select(F.col(ID).alias("v")), "v", "left_anti")
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            layer += 1
        out = results[0]
        for r in results[1:]:
            out = out.unionByName(r)
        return out


def _weighted_pairs(graph: LinkGraph) -> DataFrame:
    """Symmetric (u, v, w) pairs: canonical-ordered distinct edges summed
    per pair (reciprocal directed arcs ADD; the reversed copies an
    undirected LinkGraph materializes dedup via distinct, same convention
    as ``_undirected_pairs``), then both orientations, no self-loops."""
    w = graph.weight_col()
    canon = (
        graph.edges.select(
            F.least(SRC, DST).alias("u"),
            F.greatest(SRC, DST).alias("v"),
            w.alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    return canon.unionByName(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )


def s_core(graph: LinkGraph, s: float, max_iter: int = 10_000) -> DataFrame:
    """DataFrame[id] — the s-core (Eidsaa & Almaas, PRL 2013, public): the
    maximal subgraph where every node's WEIGHTED degree (sum of incident
    undirected edge weights) is >= s. The weighted generalization of
    k-core for graphs where edge strength, not edge count, defines
    participation — on a host link graph, "hosts exchanging at least s
    link mass with other core members".

    Same peel plan as ``k_core`` (pinned generations, per-round degree agg
    + two semi-joins, lineage truncated per phase); only the aggregate
    changes from count to sum(w). s <= 0 returns all nodes (every weighted
    degree, including 0 for isolates, qualifies)."""
    if s <= 0:
        return graph.nodes.select(ID)
    npart = int(graph.edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(graph.edges.sparkSession):
        gens = PinnedGenerations()
        pairs = gens.pin(_weighted_pairs(graph).repartition(npart, "u"))
        n_pairs = pairs.count()
        for _ in range(max_iter):
            if n_pairs == 0:
                break
            keep = (
                pairs.groupBy("u")
                .agg(F.sum("w").alias("_wd"))
                .filter(F.col("_wd") >= s)
                .select("u")
            )
            # same v-first/u-last shuffle-hash shape as _peel: the final
            # semi-join leaves hash(u) partitioning, no repartition needed
            nxt = gens.pin(
                pairs.join(
                    keep.select(F.col("u").alias("v")).hint("shuffle_hash"),
                    "v",
                    "left_semi",
                )
                .join(keep.hint("shuffle_hash"), "u", "left_semi")
                .select("u", "v", "w")
            )
            n_next = nxt.count()
            if n_next == n_pairs:
                break
            pairs, n_pairs = nxt, n_next
        out = pairs.localCheckpoint(eager=True)
        gens.release()
        return out.select(F.col("u").alias(ID)).distinct()
