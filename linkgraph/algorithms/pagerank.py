"""PageRank — normalized power iteration with damping + dangling-mass
redistribution, from scratch on DataFrame ops.

The reference delegates to ``nx.pagerank`` or GraphFrames/GraphX
(``mercury/graph/core/graph.py:681-690``); this is the from-scratch
replacement the north rule demands (BASELINE.json:6). Semantics match
``networkx.pagerank`` (normalized to sum 1, dangling mass redistributed
uniformly):

    r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)·w(u,v)/W(u)  +  D/N )
    D     = Σ_{u: out_degree(u)=0} r(u)

Scale design (100 TB / 10^12 files):
- Edges are pre-normalized ONCE (w/W(u)) and persisted hash-partitioned by
  ``src`` — every superstep's join then shuffles only the (small) rank table,
  never the edge table.
- One Spark action per superstep: L1 delta, next dangling mass and active
  count come from a single aggregate over (new ⋈ old) ranks.
- Map-side partial aggregation handles hub in-degree skew for the contribution
  sum (algebraic agg); AQE skew-join splits hot ``src`` partitions on the join.
- Per-vertex math stays in whole-stage codegen by default (the update is a
  trivial affine expression — a Python-worker round-trip per superstep buys
  nothing). ``use_arrow_kernel=True`` switches to the vectorized Arrow
  ``pandas_udf`` form (BASELINE.json:15 — never per-row Python) as the
  extension hook for non-affine per-vertex updates.
- Lineage truncated per superstep (localCheckpoint); every
  ``checkpoint_interval`` steps the score table + metrics snapshot to a
  CheckpointManager, making the run resumable mid-iteration.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from linkgraph.checkpoint import CheckpointManager
from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


@dataclass
class PageRankResult:
    ranks: DataFrame  # [id, pagerank]
    iterations: int
    converged: bool
    history: list = field(default_factory=list)  # per-superstep metric dicts
    num_nodes: int = 0
    num_edges: int = 0


def _make_update_kernel(damping: float, n: int, dangling_mass: float):
    """Vectorized Arrow kernel for the per-vertex affine update."""
    base = (1.0 - damping) / n + damping * dangling_mass / n

    def _update(contrib: pd.Series) -> pd.Series:
        return base + damping * contrib.fillna(0.0)

    return F.pandas_udf(_update, DoubleType())


def _make_personalized_kernel(damping: float, dangling_mass: float):
    """Arrow kernel for the personalized update: per-vertex teleport ``_p``."""
    scale = (1.0 - damping) + damping * dangling_mass

    def _update(contrib: pd.Series, p: pd.Series) -> pd.Series:
        return p * scale + damping * contrib.fillna(0.0)

    return F.pandas_udf(_update, DoubleType())


def update_expr(
    damping: float,
    n: int,
    dangling_mass: float,
    use_arrow_kernel: bool = False,
    personalized: bool = False,
) -> F.Column:
    """The per-vertex rank update over ``_contrib``. Default is the native
    Column form (whole-stage codegen, no Python worker round-trip); the Arrow
    kernel is the extension hook for non-affine per-vertex math.

    ``personalized=True`` replaces the uniform teleport 1/N with the
    per-vertex ``_p`` column: r' = p·((1-d) + d·D) + d·Σcontrib — the
    uniform path keeps its scalar-literal base (folded once at plan time,
    bit-identical to the pre-PPR formula)."""
    if personalized:
        if use_arrow_kernel:
            return _make_personalized_kernel(damping, dangling_mass)(
                F.col("_contrib"), F.col("_p")
            )
        return F.col("_p") * F.lit(
            (1.0 - damping) + damping * dangling_mass
        ) + F.lit(damping) * F.coalesce(F.col("_contrib"), F.lit(0.0))
    if use_arrow_kernel:
        return _make_update_kernel(damping, n, dangling_mass)(F.col("_contrib"))
    return F.lit((1.0 - damping) / n + damping * dangling_mass / n) + F.lit(
        damping
    ) * F.coalesce(F.col("_contrib"), F.lit(0.0))


def pagerank(
    graph: LinkGraph,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    num_partitions: int | None = None,
    checkpoint: CheckpointManager | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    use_arrow_kernel: bool = False,
    strategy: str = "auto",
    local_max_edges: int = 2_000_000,
    personalization: dict | None = None,
    initial_ranks: DataFrame | None = None,
) -> PageRankResult:
    """Run power iteration until L1(r' - r) <= tol or max_iter supersteps.

    ``initial_ranks`` — optional warm start: a DataFrame whose first two
    columns are (id, rank), e.g. yesterday's converged ranks on today's
    slightly-changed graph. Ranks are reindexed to the node table (missing
    nodes get 0), L1-normalized, and the iteration continues from there —
    the fixpoint is unchanged (start-independent), only the distance to it
    shrinks, so daily refreshes converge in a few supersteps instead of
    ~log(1/tol)/log(1/d). A k-step warm continuation is bit-compatible with
    an uninterrupted run up to the one normalization divide. Mutually
    exclusive with ``resume`` (which restores a checkpointed mid-run state
    including dangling mass).

    ``personalization`` — optional {node_id: weight} dict for personalized
    PageRank (PPR): the teleport distribution becomes p (weights normalized
    over graph nodes, networkx-style; nodes absent from the dict get 0) and
    dangling mass is redistributed by p instead of uniformly:

        r'(v) = (1-d)·p(v) + d·( Σ_{u→v} r(u)·w(u,v)/W(u) + D·p(v) )

    r₀ = p (the iteration's fixpoint is teleport-seeded, so starting at the
    seed distribution is both natural and what the fixed-step oracle
    replicates). The seed dict is driver-small by design (top-k seeds) and
    reaches the node table via a broadcast join — no extra shuffle.

    ``strategy`` picks the physical plan, the same way Catalyst picks
    broadcast vs shuffle joins by size:

    - ``"distributed"`` — the BSP superstep loop (one shuffle per step).
      Always correct; the only choice at scale.
    - ``"local"`` — collect the (pre-counted, guarded) edge list and power-
      iterate in numpy on the driver, identical semantics. ~100 supersteps
      on a graph that fits in one task is pure scheduler latency — on this
      engine each superstep costs ~0.3-1 s regardless of size, so a 240k-edge
      convergence run drops from ~20 s to well under 1 s.
    - ``"auto"`` (default) — probe the edge count with ``limit(k+1).count()``
      (O(threshold) even on a 100 TB table) and take the local path iff the
      graph fits ``local_max_edges`` AND no distributed-only feature is
      requested (checkpoint/resume, Arrow kernel). Both paths share the
      update rule, dangling-mass recurrence, stopping rule, and history
      schema, so results agree to summation-order ulps.
    """
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r} (auto|local|distributed)")
    needs_cluster = checkpoint is not None or resume or use_arrow_kernel
    if strategy == "local" and needs_cluster:
        raise ValueError(
            "strategy='local' cannot honor checkpoint/resume/use_arrow_kernel"
        )
    if personalization is not None:
        if not personalization or any(v < 0 for v in personalization.values()):
            raise ValueError("personalization must be a non-empty dict of >=0 weights")
    if initial_ranks is not None and resume:
        raise ValueError(
            "initial_ranks and resume are mutually exclusive starts"
        )

    def _run_distributed(release_after_build=()) -> PageRankResult:
        spark = graph.edges.sparkSession
        with static_plans(spark):
            return _pagerank_loop(
                graph,
                damping,
                tol,
                max_iter,
                num_partitions,
                checkpoint,
                checkpoint_interval,
                resume,
                use_arrow_kernel,
                release_after_build,
                personalization,
                initial_ranks,
            )

    we_persisted: list[DataFrame] = []
    if strategy == "local" or (strategy == "auto" and not needs_cluster):
        # The edge/node lineage may be an expensive derivation (self-joins,
        # dedup): persist BEFORE probing so the probes, counts, and collects
        # of the local plan — or the normalized-edge build of the distributed
        # loop when the gate falls through — run it once, not four times.
        # Probes cache only the partitions they touch, so this is
        # O(threshold) on huge inputs. Caller-owned caches are respected:
        # a DataFrame the caller already persisted is neither re-persisted
        # nor evicted here.
        for df in (graph.edges, graph.nodes):
            if not df.is_cached:
                df.persist()
                we_persisted.append(df)
        try:
            if strategy == "local" or (
                # probe BOTH tables: a mostly-isolated-node graph can have a
                # huge node table behind a tiny edge set, and the local plan
                # collects both
                graph.edges.limit(local_max_edges + 1).count() <= local_max_edges
                and graph.nodes.limit(local_max_edges + 1).count() <= local_max_edges
            ):
                return _pagerank_local(
                    graph, damping, tol, max_iter, personalization, initial_ranks
                )
            # Gate fell through to the distributed loop: keep the persist
            # alive until the loop's own persisted tables (edges_norm /
            # node_state) materialize — their builds reuse the probe's
            # cached partitions instead of re-running the derivation — then
            # release it, so the raw-table cache doesn't occupy memory for
            # ~100 supersteps that never touch it again. Ownership of the
            # unpersist transfers to the loop, so clear our list (mirrors
            # components.py) — otherwise the finally block double-releases.
            handover, we_persisted = tuple(we_persisted), []
            return _run_distributed(release_after_build=handover)
        finally:
            for df in we_persisted:
                df.unpersist()

    return _run_distributed()


def _pagerank_local(
    graph: LinkGraph,
    damping: float,
    tol: float,
    max_iter: int,
    personalization: dict | None = None,
    initial_ranks: DataFrame | None = None,
) -> PageRankResult:
    """Driver-local power iteration — the small-graph physical strategy.

    Mirrors ``_pagerank_loop`` exactly: r₀ uniform, per-step
    r' = (1-d)/N + d·(dm/N + Σ contrib) with dm from the PREVIOUS step's
    ranks, L1 stopping, per-step history. Edges from nodes outside the node
    set contribute nothing; contributions to unknown ids are dropped —
    matching the loop's inner join / left join pair."""
    import time as _time

    import numpy as np

    spark = graph.edges.sparkSession
    n = graph.number_of_nodes()
    if n == 0:
        raise ValueError("empty graph")
    w = graph.weight_col()
    epdf = (
        graph.edges.select(
            F.col(SRC).alias("s"), F.col(DST).alias("d"), w.cast("double").alias("w")
        )
    ).toPandas()
    npdf = graph.nodes.select(ID).toPandas()
    ids = npdf[ID].to_numpy()
    idx = pd.Series(np.arange(n), index=ids)
    si_all = epdf["s"].map(idx).to_numpy(dtype="float64")
    di_all = epdf["d"].map(idx).to_numpy(dtype="float64")
    wv_all = epdf["w"].to_numpy(dtype="float64")

    known_src = ~np.isnan(si_all)
    out_w = np.bincount(
        si_all[known_src].astype(np.int64), weights=wv_all[known_src], minlength=n
    )
    live = known_src & ~np.isnan(di_all)
    si = si_all[live].astype(np.int64)
    di = di_all[live].astype(np.int64)
    # 0/0 -> NaN exactly like the distributed _w/_out_w expression; NaN then
    # poisons that component's ranks identically under both plans
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = wv_all[live] / out_w[si]
    # dangling = NO out-edges at all (matches the loop's left_anti against
    # edge sources) — NOT out-weight == 0, which the loop treats as non-
    # dangling even though its fracs are NaN
    has_out = np.zeros(n, dtype=bool)
    has_out[si_all[known_src].astype(np.int64)] = True
    dangling = ~has_out

    if personalization is not None:
        p = np.zeros(n)
        hits = pd.Series(personalization).reindex(ids).fillna(0.0).to_numpy()
        tot = float(hits.sum())
        if tot <= 0:
            raise ValueError("personalization has no mass on graph nodes")
        p = hits / tot
        r = p.copy()
    else:
        p = None
        r = np.full(n, 1.0 / n)
    if initial_ranks is not None:
        c0, c1 = initial_ranks.columns[:2]
        irdf = initial_ranks.select(
            F.col(c0).alias("_id"), F.col(c1).cast("double").alias("_r")
        ).toPandas()
        # duplicate ids sum their mass (mirrors the distributed branch's
        # groupBy — and a plain reindex would raise on duplicates)
        warm = (
            irdf.groupby("_id")["_r"].sum().reindex(ids).fillna(0.0).to_numpy()
        )
        tot = float(warm.sum())
        if tot <= 0:
            raise ValueError("initial_ranks has no mass on graph nodes")
        r = warm / tot
    dm = float(r[dangling].sum())
    history: list[dict] = []
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        _t0 = _time.time()
        contrib = np.bincount(di, weights=r[si] * frac, minlength=n)
        if p is not None:
            new = p * ((1.0 - damping) + damping * dm) + damping * contrib
        else:
            new = (1.0 - damping) / n + damping * dm / n + damping * contrib
        delta = np.abs(new - r)
        l1 = float(delta.sum())
        dm = float(new[dangling].sum())
        active = int((delta > tol / max(n, 1)).sum())
        history.append(
            {
                "step": it,
                "l1_delta": l1,
                "active_vertices": active,
                "dangling_mass": dm,
                "wall_sec": round(_time.time() - _t0, 3),
            }
        )
        r = new
        if l1 <= tol:
            converged = True
            break

    ranks = spark.createDataFrame(pd.DataFrame({ID: ids, "pagerank": r}))
    return PageRankResult(
        ranks=ranks,
        iterations=it,
        converged=converged,
        history=history,
        num_nodes=n,
        num_edges=int(len(epdf)),
    )


def _pagerank_loop(
    graph: LinkGraph,
    damping: float,
    tol: float,
    max_iter: int,
    num_partitions: int | None,
    checkpoint: CheckpointManager | None,
    checkpoint_interval: int,
    resume: bool,
    use_arrow_kernel: bool,
    release_after_build=(),
    personalization: dict | None = None,
    initial_ranks: DataFrame | None = None,
) -> PageRankResult:
    spark = graph.edges.sparkSession
    has_p = personalization is not None
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    n = graph.number_of_nodes()
    if n == 0:
        raise ValueError("empty graph")

    w = graph.weight_col()
    # Out-weight per source; pre-normalize edges once. Persisted partitioned
    # by src so the per-superstep join only shuffles the rank table. The
    # shuffle_hash hint keeps the build on the node-sized aggregate: the
    # aggregate's size ESTIMATE inherits the scan's, so without the hint the
    # planner falls back to a SortMergeJoin and sorts the edge table twice
    # at build (guide §3.1 — pick the strategy deliberately).
    out_w = graph.edges.groupBy(SRC).agg(F.sum(w).alias("_out_w"))
    edges_norm = (
        graph.edges.select(SRC, DST, w.alias("_w"))
        .join(out_w.hint("shuffle_hash"), SRC)
        .select(SRC, DST, (F.col("_w") / F.col("_out_w")).alias("frac"))
        .repartition(num_partitions, SRC)
        .persist()
    )
    m = edges_norm.count()  # materialize once; also the bench denominator

    # Node state with dangling flag (no out-edges): left_anti against sources.
    ns = (
        graph.nodes.select(ID)
        .join(
            out_w.select(F.col(SRC).alias(ID)).withColumn("_has_out", F.lit(True)),
            ID,
            "left",
        )
        .select(ID, F.coalesce(F.col("_has_out"), F.lit(False)).alias("_dangling"))
        .withColumn("_dangling", ~F.col("_dangling"))
    )
    if has_p:
        # seed dict is driver-small (top-k seeds): broadcast join, no shuffle
        seed_df = spark.createDataFrame(
            [(k, float(v)) for k, v in personalization.items()], [ID, "_p_raw"]
        )
        ns = ns.join(F.broadcast(seed_df), ID, "left").withColumn(
            "_p_raw", F.coalesce(F.col("_p_raw"), F.lit(0.0))
        )
    node_state = ns.repartition(num_partitions, ID).persist()
    if has_p:
        # one agg materializes the persist AND yields the normalizer + the
        # seed mass sitting on dangling nodes (dm₀ under r₀ = p)
        row0 = node_state.agg(
            F.sum(F.when(F.col("_dangling"), 1).otherwise(0)).alias("nd"),
            F.sum("_p_raw").alias("tot"),
            F.sum(F.when(F.col("_dangling"), F.col("_p_raw")).otherwise(0.0)).alias(
                "dp"
            ),
        ).collect()[0]
        n_dangling = int(row0["nd"])
        p_total = float(row0["tot"] or 0.0)
        if p_total <= 0:
            raise ValueError("personalization has no mass on graph nodes")
        p_dangling = float(row0["dp"]) / p_total
    else:
        n_dangling = node_state.filter("_dangling").count()
    # edges_norm and node_state are now materialized; any raw-table persist
    # the strategy gate handed over is dead weight for the whole loop
    for df in release_after_build:
        df.unpersist()

    p_col = [(F.col("_p_raw") / F.lit(p_total)).alias("_p")] if has_p else []
    start_step = 0
    history: list[dict] = []
    state_ready = False
    if resume and checkpoint is not None and checkpoint.latest_step() is not None:
        start_step = checkpoint.latest_step()
        man = checkpoint.manifest(start_step)
        loaded = checkpoint.load(start_step, "ranks").withColumnRenamed(
            "pagerank", "_pr"
        )
        state = (
            node_state.join(loaded, ID)
            .select(ID, "_dangling", *p_col, F.col("_pr").alias("pagerank"))
            .repartition(num_partitions, ID)
        )
        dangling_mass = man["metrics"]["dangling_mass"]
        history = man["metrics"].get("history", [])
    elif initial_ranks is not None:
        # warm start: reindex to the node table (missing → 0), L1-normalize;
        # ONE aggregate yields normalizer + warm dangling mass together
        c0, c1 = initial_ranks.columns[:2]
        # duplicate ids sum their mass — a raw left join would silently
        # MULTIPLY node rows instead
        ir = (
            initial_ranks.select(
                F.col(c0).alias(ID), F.col(c1).cast("double").alias("_r0")
            )
            .groupBy(ID)
            .agg(F.sum("_r0").alias("_r0"))
        )
        st = node_state.join(ir, ID, "left").withColumn(
            "_r0", F.coalesce(F.col("_r0"), F.lit(0.0))
        )
        st = st.repartition(num_partitions, ID).persist()
        row_w = st.agg(
            F.sum("_r0").alias("tot"),
            F.sum(F.when(F.col("_dangling"), F.col("_r0")).otherwise(0.0)).alias(
                "dm"
            ),
        ).collect()[0]
        tot = float(row_w["tot"] or 0.0)
        if tot <= 0:
            st.unpersist()
            raise ValueError("initial_ranks has no mass on graph nodes")
        # checkpoint HERE (not at the shared line below) so st's cache can
        # be released as soon as the blocks are materialized
        state = st.select(
            ID, "_dangling", *p_col, (F.col("_r0") / F.lit(tot)).alias("pagerank")
        ).localCheckpoint(eager=True)
        dangling_mass = float(row_w["dm"]) / tot
        st.unpersist()
        state_ready = True
    elif has_p:
        # r₀ = p (teleport-seeded start; see pagerank() docstring)
        state = node_state.select(
            ID, "_dangling", *p_col, (F.col("_p_raw") / F.lit(p_total)).alias("pagerank")
        )
        dangling_mass = p_dangling
    else:
        # narrow projection of node_state: inherits its hash(id) partitioning
        state = node_state.select(ID, "_dangling", F.lit(1.0 / n).alias("pagerank"))
        dangling_mass = n_dangling / n
    # state carries (id, _dangling, pagerank) so the per-superstep update and
    # the convergence stats need NO extra joins against node_state/old ranks.
    if not state_ready:
        state = state.localCheckpoint(eager=True)

    import time as _time

    converged = False
    it = start_step
    for it in range(start_step + 1, max_iter + 1):
        _t0 = _time.time()
        # shuffle_hash on the RANK side: the checkpointed state has no size
        # statistics, so left alone the planner either sort-merges (sorting
        # the cached edge table EVERY superstep) or builds the hash map over
        # the edge side; the hint pins the build to the node-sized rank
        # table and streams the pinned edges (guide §3.1)
        contrib = (
            edges_norm.join(
                state.select(F.col(ID).alias("_rid"), "pagerank").hint(
                    "shuffle_hash"
                ),
                F.col(SRC) == F.col("_rid"),
            )
            .groupBy(DST)
            .agg(F.sum(F.col("pagerank") * F.col("frac")).alias("_contrib"))
        )
        new_rank_col = update_expr(
            damping, n, dangling_mass, use_arrow_kernel, personalized=has_p
        )
        carry_p = [F.col("_p")] if has_p else []
        # state hash(id) ⋈ contrib hash(dst): co-partitioned, no exchange;
        # the old rank rides along as _old so stats is a pure scan.
        new_state = state.join(contrib, F.col(ID) == F.col(DST), "left").select(
            ID,
            F.col("_dangling"),
            *carry_p,
            F.col("pagerank").alias("_old"),
            new_rank_col.alias("pagerank"),
        )
        # Truncate iterative lineage (the reference's checkpoint() pattern,
        # louvain.py:171-172). eager=False: the checkpoint materializes inside
        # the stats job below — exactly ONE Spark job per superstep.
        new_state = new_state.localCheckpoint(eager=False)

        # ONE action, ZERO joins: L1 delta, next dangling mass, active count.
        stats = new_state.agg(
            F.sum(F.abs(F.col("pagerank") - F.col("_old"))).alias("l1"),
            F.sum(
                F.when(F.col("_dangling"), F.col("pagerank")).otherwise(0.0)
            ).alias("dmass"),
            F.sum(
                F.when(
                    F.abs(F.col("pagerank") - F.col("_old")) > tol / max(n, 1), 1
                ).otherwise(0)
            ).alias("active"),
        ).collect()[0]
        l1, dangling_mass, active = (
            float(stats["l1"]),
            float(stats["dmass"]),
            int(stats["active"]),
        )
        step_metrics = {
            "step": it,
            "l1_delta": l1,
            "active_vertices": active,
            "dangling_mass": dangling_mass,
            "wall_sec": round(_time.time() - _t0, 3),
        }
        history.append(step_metrics)

        if checkpoint is not None and (
            it % checkpoint_interval == 0 or l1 <= tol or it == max_iter
        ):
            frontier = new_state.select(
                ID, (F.col("pagerank") - F.col("_old")).alias("delta")
            ).filter(F.abs(F.col("delta")) > tol / max(n, 1))
            checkpoint.save(
                it,
                {"ranks": new_state.select(ID, "pagerank"), "frontier": frontier},
                {
                    "l1_delta": l1,
                    "active_vertices": active,
                    "dangling_mass": dangling_mass,
                    "history": history,
                },
            )
        state = new_state.select(ID, "_dangling", *carry_p, "pagerank")
        if l1 <= tol:
            converged = True
            break

    edges_norm.unpersist()
    node_state.unpersist()
    return PageRankResult(
        ranks=state.select(ID, "pagerank"),
        iterations=it,
        converged=converged,
        history=history,
        num_nodes=n,
        num_edges=m,
    )
