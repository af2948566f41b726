"""Strongly connected components — trim + forward-coloring + backward reach
(the FW-BW/coloring family: Orzan's coloring, McLendon et al. trimming),
from scratch on DataFrame ops.

NOT present in the reference (no SCC computation anywhere under ``mercury/``
— ``Graph.connected_components`` at ``mercury/graph/core/graph.py:692-720``
is undirected-only); added because a directed-graph engine without SCC
leaves every reachability/condensation workload to the user.

Semantics: nodes u, v share a component iff each can reach the other along
directed edges. Output labels each node with the MINIMUM node id of its SCC
(canonical up to relabeling, same convention as connected_components).
Self-loops and isolated nodes are singleton SCCs labeled with their own id.

Algorithm (distributed plan), peeling rounds over the active subgraph:

1. **Trim to fixpoint**: a node with no in-edge or no out-edge inside the
   active subgraph cannot sit on a directed cycle — assign it its own id and
   drop it. Repeated trimming alone dissolves DAG regions (most of a
   web-scale graph's mass) with two cheap semi-joins per round and no
   label shuffle.
2. **Forward coloring**: propagate ``c(v) = min(c(v), min over in-edges of
   c(u))`` to fixpoint, starting from ``c(v) = v``. On convergence, ``c(v)``
   is the minimum id that forward-reaches v; every occupied color class c
   contains its own pivot node c (anything coloring c below c would also
   re-color the whole class).
3. **Backward reach**: from each pivot, grow reachability along REVERSED
   edges restricted to same-colored endpoints. The reached set of pivot c is
   exactly SCC(c), and c is its minimum member id (a smaller member would
   have recolored the pivot). Assign, peel, repeat from 1.

Every round peels at least one SCC per occupied color class, so rounds are
bounded by the longest pivot-chain, and in practice by a handful on
power-law graphs (one giant SCC + DAG periphery: trim eats the periphery,
one coloring round takes the core).

Scale notes:
- All supersteps are algebraic joins/groupBys (map-side combine bounds hub
  fan-in); there is no window and no per-row Python anywhere.
- One action per superstep: trim and backward-reach converge on a count,
  coloring on the same count+bit_xor fingerprint connected_components uses.
- Per-superstep ``localCheckpoint`` stops iterative plan growth (the same
  pattern as every other loop in this engine).
- ``strategy="auto"`` routes sub-threshold graphs (edge/node probe, O(k) at
  any table size) to a driver-local iterative Tarjan — one linear pass, no
  scheduler round-trips — with identical min-id labels.
- O(diameter) inner fixpoints: a 10M-hop directed path is the adversarial
  worst case (inherent to label propagation without pointer doubling); real
  graphs converge in tens of supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans

# superstep accounting of the last _scc_distributed call (diagnostic only —
# written on completion; read by bench/tests to see where rounds go)
LAST_STATS: dict = {}


def strongly_connected_components(
    graph: LinkGraph,
    max_iter: int = 200,
    with_sizes: bool = False,
    strategy: str = "auto",
    local_max_edges: int = 2_000_000,
    checkpoint=None,
    checkpoint_interval: int = 1,
    max_rounds: int | None = None,
    resume: bool = False,
    checkpoint_every_steps: int | None = None,
) -> DataFrame:
    """Returns DataFrame[id, scc(, scc_size)] where ``scc`` is the minimum
    node id in the strongly connected component.

    ``max_iter`` is a GLOBAL superstep budget across all peeling rounds and
    inner fixpoints; exhausting it raises (a partially-peeled SCC labeling
    is wrong, not approximate). ``strategy`` mirrors the other loops' gates:
    ``auto`` probes size and solves driver-locally under the threshold.

    ``checkpoint``/``resume`` make SCC the fifth resumable loop (after
    pagerank, two-star CC, LPA and Louvain): every ``checkpoint_interval``
    completed peel rounds the full cross-round state — remaining edges,
    active nodes, labels assigned so far, superstep accounting — is
    snapshotted through a :class:`linkgraph.checkpoint.CheckpointManager`;
    ``resume=True`` continues from the last completed round with bit-exact
    labels (peeling is deterministic: min-id coloring, no RNG anywhere).
    ``max_rounds`` is a round-granular budget kill switch: on exhaustion the
    run snapshots ``done=False`` and returns the PARTIAL labels assigned so
    far (unassigned nodes absent) for the resumed run to complete.

    ``checkpoint_every_steps`` adds MID-PHASE snapshots: every N supersteps
    inside the trim/color/reach fixpoints the full state — including the
    in-flight color table or reach frontier, tagged with a phase marker —
    is saved, so a run killed deep inside one long fixpoint (a
    high-diameter color propagation can be hundreds of supersteps) resumes
    from the last superstep, not the last completed round. Resume re-enters
    the interrupted phase directly with bit-exact continuation (the
    ``intra`` edge view is a pure derivation of saved state and is rebuilt,
    not stored)."""
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r} (auto|local|distributed)")
    needs_cluster = checkpoint is not None or resume
    if needs_cluster and strategy == "local":
        raise ValueError("strategy='local' cannot honor checkpoint/resume")
    if needs_cluster:
        strategy = "distributed"
    we_persisted: list[DataFrame] = []
    use_local = False
    labels = None
    if strategy != "distributed":
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
                labels = _scc_local(graph)
        if not use_local:
            with static_plans(graph.edges.sparkSession):
                labels = _scc_distributed(
                    graph,
                    max_iter,
                    tuple(we_persisted),
                    checkpoint=checkpoint,
                    checkpoint_interval=checkpoint_interval,
                    max_rounds=max_rounds,
                    resume=resume,
                    checkpoint_every_steps=checkpoint_every_steps,
                )
            we_persisted = []
    finally:
        for df in we_persisted:
            df.unpersist()

    if with_sizes:
        sizes = labels.groupBy("scc").agg(F.count(F.lit(1)).alias("scc_size"))
        labels = labels.join(sizes, "scc").select(ID, "scc", "scc_size")
    return labels


def _scc_local(graph: LinkGraph) -> DataFrame:
    """Driver-local iterative Tarjan — the small-graph physical strategy.

    One DFS pass, explicit stack (no recursion-limit hazard). ``np.unique``
    index order is id order (binary comparison, same as Spark's min over
    strings), so the minimum member INDEX maps back to the minimum member id
    — label parity with the distributed plan by construction."""
    import numpy as np
    import pandas as pd

    spark = graph.edges.sparkSession
    npdf = graph.nodes.select(ID).toPandas()
    epdf = graph.edges.select(SRC, DST).toPandas()
    # solve over nodes ∪ endpoints, exactly like _cc_local: an endpoint
    # outside the node table still shapes reachability; only its output row
    # is dropped
    ids = np.unique(
        np.concatenate(
            [npdf[ID].to_numpy(), epdf[SRC].to_numpy(), epdf[DST].to_numpy()]
        )
    )
    n = len(ids)
    if n == 0:
        t = graph.nodes.schema[ID].dataType.simpleString()
        return spark.createDataFrame([], f"{ID} {t}, scc {t}")
    lookup = pd.Series(np.arange(n), index=ids)
    u = epdf[SRC].map(lookup).to_numpy(dtype=np.int64)
    v = epdf[DST].map(lookup).to_numpy(dtype=np.int64)
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    # CSR out-adjacency
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, u + 1, 1)
    indptr = np.cumsum(indptr)

    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        # (node, next-edge-cursor) work stack
        work = [(root, indptr[root])]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            x, cur = work[-1]
            if cur < indptr[x + 1]:
                work[-1] = (x, cur + 1)
                y = v[cur]
                if index[y] == -1:
                    index[y] = low[y] = counter
                    counter += 1
                    stack.append(y)
                    on_stack[y] = True
                    work.append((y, indptr[y]))
                elif on_stack[y]:
                    low[x] = min(low[x], index[y])
            else:
                work.pop()
                if work:
                    px = work[-1][0]
                    low[px] = min(low[px], low[x])
                if low[x] == index[x]:
                    members = []
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        members.append(w)
                        if w == x:
                            break
                    rep = min(members)  # min INDEX == min id (sorted ids)
                    for w in members:
                        comp[w] = rep

    out = pd.DataFrame({ID: ids, "scc": ids[comp]})
    out = out[out[ID].isin(set(npdf[ID]))].reset_index(drop=True)
    if len(out) == 0:
        t = graph.nodes.schema[ID].dataType.simpleString()
        return spark.createDataFrame([], f"{ID} {t}, scc {t}")
    return spark.createDataFrame(out)


def _label_fp(labels: DataFrame) -> tuple[int, int]:
    row = labels.agg(
        F.count(F.lit(1)).alias("c"),
        F.coalesce(F.bit_xor(F.xxhash64("id", "c")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


def _semi_on(df: DataFrame, keep: DataFrame, col: str) -> DataFrame:
    return df.join(keep.select(F.col("id").alias(col)), col, "left_semi")


def _scc_distributed(
    graph: LinkGraph,
    max_iter: int,
    release_after_build=(),
    checkpoint=None,
    checkpoint_interval: int = 1,
    max_rounds: int | None = None,
    resume: bool = False,
    checkpoint_every_steps: int | None = None,
) -> DataFrame:
    spark = graph.edges.sparkSession
    # Edges are kept hash-partitioned by u across supersteps and PINNED
    # (persist keeps the repartition visible to Catalyst — a localCheckpoint
    # would degrade to an unknown-partitioning RDD scan and re-exchange the
    # edge table under every coloring join): only the node-sized color
    # table shuffles per superstep, the same rank-side-only-shuffle shape
    # as pagerank's loop. Each peel derives a NEW pinned generation from
    # the previous (materialized from its cache), then releases the old.
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    _pinned: list[DataFrame] = []

    def _by_u(e: DataFrame, pre_partitioned: bool = False) -> DataFrame:
        # pre_partitioned: the caller's plan already ends in a hash(u)
        # exchange at npart (e.g. a shuffle-hash semi-join keyed u), so the
        # explicit repartition would be a pure duplicate edge-sized
        # exchange (guide §2.4)
        df = e if pre_partitioned else e.repartition(npart, "u")
        df = df.persist()
        df.count()  # materialize BEFORE releasing the generation it reads
        while _pinned:
            _pinned.pop().unpersist()
        _pinned.append(df)
        return df

    def _shrunk(e: DataFrame, keep: DataFrame) -> DataFrame:
        # restrict to keep-endpoints v-side FIRST, u-side LAST: the final
        # shuffle-hash semi-join leaves the table hash(u)-partitioned at
        # npart, exactly the layout _by_u pins — one edge-sized exchange
        # fewer per generation rebuild than filter-u/filter-v/repartition-u.
        # The hint pins the physical strategy: a broadcast here would keep
        # the hash(v) partitioning and silently re-exchange every superstep.
        step = _semi_on(e, keep.hint("shuffle_hash"), "v")
        return _by_u(
            _semi_on(step, keep.hint("shuffle_hash"), "u"), pre_partitioned=True
        )

    def _restrict(labels: DataFrame) -> DataFrame:
        # parity with connected_components: outside endpoints shape
        # reachability but emit no output row
        return labels.join(
            graph.nodes.select(F.col(ID).alias("id")), "id", "left_semi"
        )

    parts: list[DataFrame] = []
    stats = {"rounds": 0, "trim": 0, "color": 0, "reach": 0, "other": 0}
    steps = 0
    # phase state machine: "trim" → "color" → "reach" → (peel) → "trim".
    # Mid-phase snapshots (checkpoint_every_steps) carry the phase marker
    # plus the phase-local tables; `intra` is never stored — it is a pure
    # derivation of (edges, color), rebuilt on resume.
    phase = "trim"
    color: DataFrame | None = None
    fp: tuple | None = None
    reached: DataFrame | None = None
    n_reached = 0

    if resume and checkpoint is not None and checkpoint.latest_step() is not None:
        step0 = checkpoint.latest_step()
        met = checkpoint.manifest(step0)["metrics"]
        stats = dict(met["stats"])
        steps = met["steps"]
        if met["n_assigned"]:
            parts = [checkpoint.load(step0, "assigned").localCheckpoint(eager=False)]
        for df in release_after_build:
            df.unpersist()
        if met.get("done"):
            LAST_STATS.clear()
            LAST_STATS.update(stats, total=steps)
            if not parts:
                t = graph.nodes.schema[ID].dataType.simpleString()
                return spark.createDataFrame([], f"{ID} {t}, scc {t}")
            return _restrict(parts[0])
        edges = _by_u(checkpoint.load(step0, "edges"))
        active = checkpoint.load(step0, "active").localCheckpoint(eager=False)
        n_active = met["n_active"]
        phase = met.get("phase", "trim")
        if phase in ("color", "reach"):
            color = checkpoint.load(step0, "color").localCheckpoint(eager=False)
            fp = tuple(met["fp"])
        if phase == "reach":
            reached = checkpoint.load(step0, "reached").localCheckpoint(eager=False)
            n_reached = met["n_reached"]
    else:
        edges = _by_u(
            graph.edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
            .filter(F.col("u") != F.col("v"))  # self-loops don't change SCCs
            .distinct()
        )
        active = (
            graph.nodes.select(F.col(ID).alias("id"))
            .union(edges.select(F.col("u").alias("id")))
            .union(edges.select(F.col("v").alias("id")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        n_active = active.count()
        for df in release_after_build:
            df.unpersist()

    def _assigned() -> DataFrame | None:
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def _save(done: bool, cur_phase: str = "trim"):
        # step index = global superstep count: strictly increasing across
        # both round-granular and mid-phase saves
        assigned = _assigned()
        tables = {} if done else {"edges": edges, "active": active}
        if not done and cur_phase in ("color", "reach"):
            tables["color"] = color
        if not done and cur_phase == "reach":
            tables["reached"] = reached
        if assigned is not None:
            tables["assigned"] = assigned
        checkpoint.save(
            steps,
            tables,
            {
                "done": done,
                "n_active": n_active,
                "n_assigned": len(parts),
                "steps": steps,
                "stats": stats,
                "phase": cur_phase,
                "fp": list(fp) if fp is not None else None,
                "n_reached": n_reached,
            },
        )

    def _maybe_save_mid(cur_phase: str):
        nonlocal last_saved_steps
        if (
            checkpoint is not None
            and checkpoint_every_steps
            and steps - last_saved_steps >= checkpoint_every_steps
        ):
            _save(done=False, cur_phase=cur_phase)
            last_saved_steps = steps

    def _spend(kind: str = "other"):
        nonlocal steps
        stats[kind] += 1
        steps += 1
        if steps > max_iter:
            raise RuntimeError(
                f"scc did not finish within max_iter={max_iter} supersteps "
                f"({n_active} nodes still unassigned); raise max_iter — "
                "inner fixpoints are O(active-subgraph diameter)"
            )

    saved_done = False
    last_saved_steps = steps
    while n_active > 0:
        if phase == "trim":
            if max_rounds is not None and stats["rounds"] >= max_rounds:
                # budget kill switch (round-granular, checked at round
                # boundaries): snapshot the cross-round state and hand back
                # the labels peeled so far (partial — resume to complete)
                if checkpoint is not None and last_saved_steps != steps:
                    _save(done=False)
                LAST_STATS.clear()
                LAST_STATS.update(stats, total=steps)
                a = _assigned()
                if a is None:
                    t = graph.nodes.schema[ID].dataType.simpleString()
                    while _pinned:
                        _pinned.pop().unpersist()
                    return spark.createDataFrame([], f"{ID} {t}, scc {t}")
                a = _restrict(a).localCheckpoint(eager=True)
                while _pinned:
                    _pinned.pop().unpersist()
                return a
            # ---- 1. trim to fixpoint: no in-edge or no out-edge => singleton
            while True:
                core = (
                    _semi_on(
                        _semi_on(active, edges.select(F.col("u").alias("id")), "id"),
                        edges.select(F.col("v").alias("id")),
                        "id",
                    )
                    .localCheckpoint(eager=False)
                )
                n_core = core.count()
                _spend("trim")
                if n_core == n_active:
                    break
                parts.append(
                    active.join(core, "id", "left_anti")
                    .select("id", F.col("id").alias("scc"))
                    .localCheckpoint(eager=False)
                )
                active, n_active = core, n_core
                edges = _shrunk(edges, core)
                _maybe_save_mid("trim")
                if n_active == 0:
                    break
            if n_active == 0:
                break

            # ---- 2. forward coloring: init
            color = active.select("id", F.col("id").alias("c")).localCheckpoint(
                eager=False
            )
            fp = _label_fp(color)
            _spend("color")
            phase = "color"
            _maybe_save_mid("color")

        if phase == "color":
            # forward min-coloring to fixpoint (resumes from loaded color/fp)
            while True:
                inc = (
                    edges.join(
                        # shuffle_hash: build the node-sized color table,
                        # stream the pinned edges — the checkpointed color
                        # has no stats, so the planner would sort-merge and
                        # SORT the cached edge table every color superstep
                        color.select(
                            F.col("id").alias("u"), F.col("c").alias("cu")
                        ).hint("shuffle_hash"),
                        "u",
                    )
                    .groupBy("v")
                    .agg(F.min("cu").alias("cin"))
                )
                color_new = (
                    color.join(inc, color["id"] == inc["v"], "left")
                    .select(
                        "id",
                        F.least(F.col("c"), F.coalesce("cin", "c")).alias("c"),
                    )
                    .localCheckpoint(eager=False)
                )
                fp_new = _label_fp(color_new)
                _spend("color")
                color = color_new
                if fp_new == fp:
                    break
                fp = fp_new
                _maybe_save_mid("color")

            reached = color.filter(F.col("id") == F.col("c")).select("id")
            reached = reached.localCheckpoint(eager=False)
            n_reached = reached.count()
            _spend("reach")
            phase = "reach"
            _maybe_save_mid("reach")

        if phase == "reach":
            # ---- 3. backward reach from pivots within each color class.
            # `intra` is a pure derivation of (edges, color): rebuilt here on
            # mid-phase resume rather than checkpointed.
            # PINNED (persist, not localCheckpoint): the second join leaves
            # intra hash(v)-partitioned at npart — exactly the key the reach
            # semi-join probes — and a persist keeps that partitioning
            # visible to Catalyst, so only the node-sized reached set
            # shuffles per reach superstep. The former localCheckpoint
            # degraded intra to an unknown-partitioning RDD scan and
            # re-exchanged the edge-sized table EVERY superstep (12 of the
            # 28 bench supersteps were reach rounds).
            intra = (
                edges.join(
                    color.select(F.col("id").alias("u"), F.col("c").alias("cu")), "u"
                )
                .join(
                    color.select(F.col("id").alias("v"), F.col("c").alias("cv")), "v"
                )
                .filter(F.col("cu") == F.col("cv"))
                .select("u", "v")
                .persist()
            )
            while True:
                grown = (
                    reached.union(
                        # build the node-sized reached set (hint), stream
                        # the pinned intra view — sort-merge would re-sort
                        # the cached edge side every reach superstep
                        _semi_on(
                            intra, reached.hint("shuffle_hash"), "v"
                        ).select(F.col("u").alias("id"))
                    )
                    .distinct()
                    .localCheckpoint(eager=False)
                )
                n_grown = grown.count()
                _spend("reach")
                if n_grown == n_reached:
                    break
                reached, n_reached = grown, n_grown
                _maybe_save_mid("reach")
            intra.unpersist()

            parts.append(
                reached.join(color, "id").select("id", F.col("c").alias("scc"))
                .localCheckpoint(eager=False)
            )
            active = active.join(reached, "id", "left_anti").localCheckpoint(
                eager=False
            )
            edges = _shrunk(edges, active)
            n_active = active.count()
            _spend("other")
            stats["rounds"] += 1
            color = fp = reached = None
            n_reached = 0
            phase = "trim"
            if checkpoint is not None and (
                stats["rounds"] % checkpoint_interval == 0 or n_active == 0
            ):
                _save(done=n_active == 0)
                saved_done = n_active == 0
                last_saved_steps = steps

    if checkpoint is not None and not saved_done:
        # covers completion paths that exit mid-round (trim dissolving the
        # last active nodes) or before round 1 ever completes
        _save(done=True)
    LAST_STATS.clear()
    LAST_STATS.update(stats, total=steps)
    out = _assigned()
    if out is None:
        t = graph.nodes.schema[ID].dataType.simpleString()
        while _pinned:
            _pinned.pop().unpersist()
        return spark.createDataFrame([], f"{ID} {t}, scc {t}")
    # sever before releasing the pinned edges: some `parts` snapshots are
    # lazy (eager=False) and may still reference an edge generation
    out = _restrict(out).localCheckpoint(eager=True)
    while _pinned:
        _pinned.pop().unpersist()
    return out


def condensation(graph: LinkGraph, labels: DataFrame | None = None) -> DataFrame:
    """Condensation DAG of the strongly-connected-component quotient:
    DataFrame[src_scc, dst_scc], the DISTINCT inter-component edges (each
    component named by its min-id label; intra-component edges dropped).
    Always acyclic (contracting SCCs of any digraph yields a DAG —
    networkx ``condensation`` parity up to the id-vs-integer naming).

    ``labels`` skips the SCC run when a labeling (DataFrame[id, scc]) is
    already at hand — e.g. the checkpointed result of a resumed run.

    Scale notes: two hash joins of the edge table against the label table
    (both on node id — a broadcast when the label side is small, AQE
    otherwise) and one distinct on the short (src_scc, dst_scc) pair; no
    windows, no driver loop. NOT in the reference (no SCC code under
    ``mercury/``)."""
    if labels is None:
        labels = strongly_connected_components(graph)
    lab = labels.select(ID, "scc")
    out = (
        graph.edges.select(F.col(SRC).alias("_s"), F.col(DST).alias("_d"))
        .join(lab.select(F.col(ID).alias("_s"), F.col("scc").alias("src_scc")), "_s")
        .join(lab.select(F.col(ID).alias("_d"), F.col("scc").alias("dst_scc")), "_d")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .select("src_scc", "dst_scc")
        .distinct()
    )
    return out
