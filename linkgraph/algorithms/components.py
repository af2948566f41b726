"""Connected components — alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) or iterative
min-label propagation, from scratch on DataFrame ops.

Replaces the reference's delegation to ``nx.connected_components`` /
GraphFrames ``connectedComponents(algorithm='graphx')``
(``mercury/graph/core/graph.py:692-720``). Directed input is treated as
undirected, exactly as graph.py:698-701. Output labels each node with the
minimum node id of its component (canonical up to relabeling), plus component
sizes via groupBy(component).count() as graph.py:712-714.

Scale notes:
- two_star converges in O(log^2 n) rounds regardless of diameter — the right
  default for web-scale graphs; min_label is O(diameter) and kept for tiny
  graphs / cross-checking.
- Convergence is detected with a cheap order-insensitive fingerprint
  (count + sum(xxhash64(u,v))) instead of an exceptAll diff.
- Each round's edge set is localCheckpointed to stop iterative plan growth
  (reference pattern: louvain.py:171-172).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


def _fingerprint(pairs: DataFrame) -> tuple[int, int]:
    # bit_xor is order-insensitive and overflow-free (ANSI-safe, unlike sum);
    # pairs are distinct so xor-cancellation of duplicates cannot occur.
    row = pairs.agg(
        F.count(F.lit(1)).alias("c"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


def _large_star(pairs: DataFrame) -> DataFrame:
    """For each u with neighborhood Γ(u): m = min(Γ(u) ∪ {u}); emit (v, m)
    for v ∈ Γ(u) with v > u.

    No terminal distinct: duplicate (v, m) emissions are bounded by the edge
    count and the immediately-following small-star round dedups at its end —
    dropping the intermediate shuffle is ~13% per round (measured at 2.3M
    edges), with each round's output still exactly distinct."""
    und = pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("u", "_mn").alias("m"))
    # shuffle_hash: build the node-sized min table, stream the pair table —
    # the aggregate's size estimate inherits the pair table's, so without
    # the hint the planner sort-merges and SORTS the 2|E| rows every round
    # (guide §3.1); the pair-side exchange stays shared with the groupBy's
    # via ReuseExchange either way
    return (
        und.join(mins.hint("shuffle_hash"), "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(pairs: DataFrame) -> DataFrame:
    """Orient (u,v) so u ≥ v; per u: m = min(Γ(v≤u) ∪ {u}); emit (v, m) for
    v ∈ Γ(u) ∪ {u}, dropping self-pairs."""
    oriented = pairs.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        oriented.join(mins.hint("shuffle_hash"), "u")  # see _large_star
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def connected_components(
    graph: LinkGraph,
    method: str = "two_star",
    max_iter: int = 50,
    with_sizes: bool = True,
    strategy: str = "auto",
    local_max_edges: int = 2_000_000,
    checkpoint=None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    initial_labels: DataFrame | None = None,
) -> DataFrame:
    """Returns DataFrame[id, component(, component_size)] where component is
    the min node id in the component.

    ``initial_labels`` — optional warm start for ADDITIVELY evolving graphs
    (yesterday's labels on today's graph after edge/node additions): the
    first two columns are (id, component). Each labeled node gains a
    virtual shortcut edge to its old component representative, so every old
    component starts at diameter ≤ 2 and the rounds only pay for what the
    NEW edges merge. Output semantics are unchanged (old components are
    genuinely connected, and their labels are node ids, so min-id per
    merged component is identical to a cold run). CORRECTNESS REQUIRES no
    edge/node removals since the labels were computed — removals can split
    components, which shortcuts would silently re-glue; run cold after
    deletions.

    ``strategy`` mirrors pagerank's size-based physical choice: ``"auto"``
    probes the edge count (``limit(k+1).count()``, O(threshold) at any table
    size) and routes sub-threshold graphs to a driver-local numpy min-label +
    pointer-doubling solve — two-star rounds on a graph that fits in one task
    are pure scheduler latency. Labels are identical (min node id per
    component) under both plans.

    ``checkpoint``/``resume`` mirror pagerank's resumability (north rule,
    BASELINE.json:14): every ``checkpoint_interval`` rounds (and at
    convergence) the two-star pair table is snapshotted through a
    :class:`linkgraph.checkpoint.CheckpointManager` with its convergence
    fingerprint and per-round history; ``resume=True`` continues from the
    latest snapshot, bit-exact with an uninterrupted run. Two-star only —
    these options force the distributed plan (as in pagerank)."""
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r} (auto|local|distributed)")
    if method not in ("two_star", "min_label"):
        # validate eagerly even when the local plan would ignore it — a typo
        # must not surface only once the input outgrows the local threshold
        raise ValueError(f"unknown method {method!r} (two_star|min_label)")
    if initial_labels is not None and resume:
        # mirror pagerank: a resumed snapshot already encodes label state, and
        # the resume branch replays the checkpointed pair table without ever
        # reading graph.edges — the warm labels would be silently dropped
        raise ValueError("initial_labels and resume are mutually exclusive starts")
    if initial_labels is not None:
        c0, c1 = initial_labels.columns[:2]
        shortcut = initial_labels.select(
            F.col(c0).alias(SRC), F.col(c1).alias(DST)
        ).filter(F.col(SRC) != F.col(DST))
        graph = LinkGraph(
            graph.edges.select(SRC, DST).unionByName(shortcut),
            nodes=graph.nodes,
        )
    needs_cluster = checkpoint is not None or resume
    if needs_cluster:
        if strategy == "local":
            raise ValueError("strategy='local' cannot honor checkpoint/resume")
        if method != "two_star":
            raise ValueError("checkpoint/resume is implemented for two_star")
        strategy = "distributed"
    use_local = False
    we_persisted: list[DataFrame] = []
    if strategy != "distributed":
        # Persist before probing: the edge lineage may be an expensive
        # derivation, and the probes + collects of the local plan — or the
        # two-star rounds when the gate falls through to distributed — would
        # otherwise re-run it (probes cache only the partitions they touch).
        # Caller-owned caches are respected: never re-persist or evict a
        # DataFrame the caller already cached.
        for df in (graph.edges, graph.nodes):
            if not df.is_cached:
                df.persist()
                we_persisted.append(df)
    try:
        if strategy != "distributed":
            use_local = strategy == "local" or (
                graph.edges.limit(local_max_edges + 1).count() <= local_max_edges
                and graph.nodes.limit(local_max_edges + 1).count() <= local_max_edges
            )
            if use_local:
                labels = _cc_local(graph)
        if not use_local:
            # persist stays alive until the round loop materializes its own
            # checkpointed pair/label tables (which reuse the probe's cached
            # partitions), then is released inside the loop so the raw-table
            # cache doesn't ride along for every remaining round
            with static_plans(graph.edges.sparkSession):
                if method == "two_star":
                    labels = _cc_two_star(
                        graph,
                        max_iter,
                        tuple(we_persisted),
                        checkpoint=checkpoint,
                        checkpoint_interval=checkpoint_interval,
                        resume=resume,
                    )
                else:
                    labels = _cc_min_label(graph, max_iter, tuple(we_persisted))
            we_persisted = []
    finally:
        for df in we_persisted:
            df.unpersist()

    if with_sizes:
        sizes = labels.groupBy("component").agg(
            F.count(F.lit(1)).alias("component_size")
        )
        labels = labels.join(sizes, "component").select(
            ID, "component", "component_size"
        )
    return labels


def _cc_local(graph: LinkGraph) -> DataFrame:
    """Driver-local components — the small-graph physical strategy.

    Vectorized min-label propagation with pointer doubling: each round folds
    the smaller endpoint label across every edge (``np.minimum.at``) then
    compresses chains with ``lab = lab[lab]`` to a fixpoint, so rounds are
    O(log n) like two-star, not O(diameter). ``np.unique`` index order IS id
    order (binary/codepoint comparison, same as Spark's min over strings), so
    the min-index root maps back to the min-id component label."""
    import numpy as np
    import pandas as pd

    spark = graph.edges.sparkSession
    npdf = graph.nodes.select(ID).toPandas()
    epdf = graph.edges.select(SRC, DST).toPandas()
    # Solve over nodes ∪ edge endpoints: an endpoint outside the node set
    # still BRIDGES components in the distributed two-star (its pair rows
    # exist, only its output row is dropped) — parity requires the same here.
    ids = np.unique(
        np.concatenate(
            [npdf[ID].to_numpy(), epdf[SRC].to_numpy(), epdf[DST].to_numpy()]
        )
    )
    n = len(ids)
    if n == 0:
        t = graph.nodes.schema[ID].dataType.simpleString()
        return spark.createDataFrame([], f"{ID} {t}, component {t}")
    lookup = pd.Series(np.arange(n), index=ids)
    u = epdf[SRC].map(lookup).to_numpy(dtype=np.int64)
    v = epdf[DST].map(lookup).to_numpy(dtype=np.int64)

    lab = np.arange(n, dtype=np.int64)
    while True:
        low = np.minimum(lab[u], lab[v])
        new = lab.copy()
        np.minimum.at(new, u, low)
        np.minimum.at(new, v, low)
        while True:
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, lab):
            break
        lab = new

    out = pd.DataFrame({ID: ids, "component": ids[lab]})
    out = out[out[ID].isin(set(npdf[ID]))].reset_index(drop=True)
    if len(out) == 0:
        # empty node table + non-empty edges: pandas can't carry a dtype for
        # zero object rows, so build the typed empty result explicitly (same
        # schema the distributed path returns)
        t = graph.nodes.schema[ID].dataType.simpleString()
        return spark.createDataFrame([], f"{ID} {t}, component {t}")
    return spark.createDataFrame(out)


def _cc_two_star(
    graph: LinkGraph,
    max_iter: int,
    release_after_build=(),
    checkpoint=None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> DataFrame:
    # eager=False: the fingerprint aggregate is the ONE action per round and
    # materializes the checkpoint as a side effect (same fused superstep
    # shape as pagerank's stats job). Measured ~neutral at 1.2M edges (the
    # eager variant's second pass is a cached scan), but one fewer job per
    # round is one fewer scheduler round-trip at any scale.
    start_round = 0
    history: list[dict] = []
    if resume and checkpoint is not None and checkpoint.latest_step() is not None:
        start_round = checkpoint.latest_step()
        man = checkpoint.manifest(start_round)
        pairs = checkpoint.load(start_round, "pairs").localCheckpoint(eager=False)
        fp = tuple(man["metrics"]["fingerprint"])
        history = man["metrics"].get("history", [])
        for df in release_after_build:
            df.unpersist()
        if man["metrics"].get("converged"):
            max_iter = 0  # nothing left to iterate; fall through to labeling
    else:
        pairs = (
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        fp = _fingerprint(pairs)
        # the initial pair set is checkpoint-materialized by the fingerprint
        # action above; a raw-table persist handed over by the strategy gate
        # is dead weight from here on
        for df in release_after_build:
            df.unpersist()
    for rnd in range(start_round + 1, start_round + 1 + max_iter):
        pairs = _small_star(_large_star(pairs)).localCheckpoint(eager=False)
        fp_new = _fingerprint(pairs)
        converged = fp_new == fp
        # active-pair delta is the two-star convergence metric (the pair set
        # is the frontier: it IS what changes between rounds)
        history.append(
            {"round": rnd, "pairs": fp_new[0], "pairs_delta": fp_new[0] - fp[0]}
        )
        if checkpoint is not None and (
            rnd % checkpoint_interval == 0
            or converged
            or rnd == start_round + max_iter
        ):
            checkpoint.save(
                rnd,
                {"pairs": pairs},
                {
                    "fingerprint": list(fp_new),
                    "converged": converged,
                    "history": history,
                },
            )
        if converged:
            break
        fp = fp_new
    # Converged: pairs are (node → root). Roots and isolated nodes map to self.
    membership = pairs.select(F.col("u").alias(ID), F.col("v").alias("component"))
    return (
        graph.nodes.select(ID)
        .join(membership, ID, "left")
        .select(ID, F.coalesce("component", ID).alias("component"))
    )


def _cc_min_label(
    graph: LinkGraph, max_iter: int, release_after_build=()
) -> DataFrame:
    und = (
        graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
        .union(graph.edges.select(F.col(DST).alias("u"), F.col(SRC).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    if release_after_build:
        und.count()  # materialize und's cache, then drop the gate's raw persist
        for df in release_after_build:
            df.unpersist()
    labels = graph.nodes.select(ID, F.col(ID).alias("component")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels.hint("shuffle_hash"), und["u"] == labels[ID])
            .groupBy("v")
            .agg(F.min("component").alias("_nbr"))
        )  # build the node-sized label table, stream the pinned edges
        # carry the old label through: convergence check is a scan, no join
        staged = labels.join(nbr_min, labels[ID] == nbr_min["v"], "left").select(
            ID,
            F.col("component").alias("_old"),
            F.least("component", "_nbr").alias("component"),
        ).localCheckpoint(eager=False)
        changed = (
            staged.agg(
                F.sum(F.when(F.col("component") != F.col("_old"), 1).otherwise(0))
            ).collect()[0][0]
            or 0
        )
        labels = staged.select(ID, "component")
        if changed == 0:
            break
    und.unpersist()
    return labels
