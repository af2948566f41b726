"""Batched multi-seed personalized PageRank + related-nodes top-k.

NOT present in the reference (its PageRank surface is single-teleport,
``mercury/graph/core/graph.py``); added because the canonical link-graph
products built ON PPR — related pages, who-to-follow, topic-sensitive
rank — need PPR from MANY seeds, and running the single-seed loop S times
costs S full power iterations over the whole graph. The batched loop runs
ALL seeds in one superstep sequence over sparse (seed, node) state:

    state: DataFrame[_s, id, r]   — only nonzero entries exist
    contrib(_s, v) = Σ_{u→v} r(_s, u) · w(u,v)/W(u)     (one join + agg)
    dangling(_s)   = Σ_{u dangling} r(_s, u)            (fused, same pass)
    r'(_s, v)      = (1−d)·[v = seed_s] + d·(contrib + dangling·[v = seed_s])

Per superstep that is ONE shuffle keyed (_s, dst) — the engine's standard
rank-side-only-shuffle shape with the seed index riding along in the key
(which also spreads hot hub rows of popular seeds across S partitions).
State size is Σ_s |reach(s)| — sparse until mass actually arrives, so 10k
seeds over a 100 TB graph stream through the same plan as one. Per-seed
semantics are EXACTLY the engine's ``pagerank(personalization={s: 1})``:
teleport and dangling mass both return to the seed, r₀ = p, stop when the
WORST seed's L1 delta ≤ tol (each seed's iterate is the same vector the
single-seed loop produces, superstep for superstep).

Exact zeros are dropped by construction (they carry no information and
re-densifying S × N rows is exactly what this operator exists to avoid);
nodes unreachable from a seed simply have no row for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def personalized_pagerank_batch(
    graph: LinkGraph,
    seeds: list,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    broadcast_max_rows: int = 500_000,
    transition_path: str | None = None,
) -> DataFrame:
    """DataFrame[seed, id, pagerank] — for every seed, its personalized
    PageRank vector (sums to 1 per seed; only nonzero rows). ``seeds`` is a
    driver-small list of node ids (the broadcastable query set); duplicate
    seeds are an error, phantom seeds (absent from the graph) too — a
    silent empty result per phantom would read as "seed has no neighbors".

    Physical gate: while the sparse state holds ≤ ``broadcast_max_rows``
    rows (tracked each round by the SAME aggregate that reads the L1
    delta — no extra action), the contribution join BROADCASTS the state:
    a superstep is then one edge-table scan + the small (_s, dst) contrib
    shuffle, with no per-round state exchange at all. On this engine's
    single-host bench the fallback (shuffled-hash join against the pinned
    edge table) measures the same — the superstep is bound by the 24M-row
    cached scan, which is memory-bandwidth-limited (the capacity-
    normalization analysis in BENCH/BASELINE.md) — but on a multi-node
    cluster the broadcast removes a network round-trip per superstep.
    When the state outgrows the gate, rounds fall back to the partitioned
    join.

    Frontier pruning: without ``transition_path`` every superstep SCANS
    the full (pinned) edge table — the probe side of any join must. Pass
    ``transition_path`` (a table written by
    :func:`linkgraph.io.write_transition_pruned` — normalized fracs
    partitioned by ``pmod(xxhash64(u), B)``) and each round instead scans
    ONLY the buckets the current frontier's sources hash into (the
    frontier's bucket ids — ≤ B ints — become a literal partition filter),
    so per-round work tracks the frontier, not the graph: the design
    already applied to the IVF inverted lists
    (``pipeline/similarity.py``). Results are bit-identical either way
    (normalization happens once at write time)."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    if len(set(seeds)) != len(seeds):
        raise ValueError("seeds must be unique")
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_plans(spark):
        if transition_path is not None:
            from linkgraph.io import transition_meta

            edges = None
            n_buckets = transition_meta(spark, transition_path)
            dangling = pin_partitioned(
                spark.read.parquet(f"{transition_path}/dangling")
            )
        else:
            w = graph.weight_col()
            raw = graph.edges.select(
                F.col(SRC).alias("u"), F.col(DST).alias("v"), w.alias("w")
            )
            outw = raw.groupBy("u").agg(F.sum("w").alias("wsum"))
            edges = pin_partitioned(
                # shuffle_hash: the aggregate's size estimate inherits the
                # scan's, so left alone this build falls back to a
                # SortMergeJoin that sorts the edge table twice (guide §3.1)
                raw.join(outw.hint("shuffle_hash"), "u")
                .select("u", "v", (F.col("w") / F.col("wsum")).alias("frac"))
                .repartition(npart, "u")
            )
            # dangling = nodes with NO out-edges (pagerank.py semantics)
            dangling = pin_partitioned(
                graph.nodes.select(ID).join(
                    edges.select(F.col("u").alias(ID)).distinct(),
                    ID,
                    "left_anti",
                )
            )
        id_t = graph.nodes.schema[ID].dataType.simpleString()
        seed_rows = [(int(i), s) for i, s in enumerate(seeds)]
        seed_df = pin_partitioned(
            spark.createDataFrame(seed_rows, f"_s int, {ID} {id_t}")
        )
        missing = seed_df.join(graph.nodes.select(ID), ID, "left_anti").count()
        if missing:
            raise ValueError(f"{missing} seed(s) are not nodes of the graph")

        state = seed_df.select("_s", ID, F.lit(1.0).alias("r")).localCheckpoint(
            eager=True
        )
        state_rows = len(seeds)
        converged = False
        try:
            for _ in range(max_iter):
                st = (
                    F.broadcast(state)
                    if state_rows <= broadcast_max_rows
                    else state
                )
                if transition_path is not None:
                    from linkgraph.io import scan_transition_for_frontier

                    edges_r = scan_transition_for_frontier(
                        spark, transition_path, state.select(ID), n_buckets
                    )
                else:
                    edges_r = edges
                contrib = (
                    st.join(edges_r, st[ID] == edges_r["u"])
                    .select("_s", F.col("v").alias(ID), (F.col("r") * F.col("frac")).alias("c"))
                    .groupBy("_s", ID)
                    .agg(F.sum("c").alias("c"))
                )
                dmass = (
                    dangling.join(st, ID)
                    .groupBy("_s")
                    .agg(F.sum("r").alias("D"))
                )
                nxt = (
                    contrib.join(seed_df.withColumn("_p", F.lit(1.0)), ["_s", ID], "full")
                    .join(dmass, "_s", "left")
                    .select(
                        "_s",
                        ID,
                        (
                            (1.0 - damping) * F.coalesce("_p", F.lit(0.0))
                            + damping
                            * (
                                F.coalesce("c", F.lit(0.0))
                                + F.coalesce("D", F.lit(0.0))
                                * F.coalesce("_p", F.lit(0.0))
                            )
                        ).alias("r"),
                    )
                    .filter(F.col("r") != 0.0)
                    .localCheckpoint(eager=True)
                )
                # worst-seed L1 delta AND the new state's row count (feeds
                # the broadcast gate) in one fused aggregate — one action
                row = (
                    nxt.withColumnRenamed("r", "rn")
                    .join(state, ["_s", ID], "full")
                    .groupBy("_s")
                    .agg(
                        F.sum(
                            F.abs(
                                F.coalesce("rn", F.lit(0.0))
                                - F.coalesce("r", F.lit(0.0))
                            )
                        ).alias("l1"),
                        F.count("rn").alias("nr"),
                    )
                    .agg(F.max("l1").alias("mx"), F.sum("nr").alias("rows"))
                    .collect()[0]
                )
                delta, state_rows = row["mx"], int(row["rows"] or 0)
                state = nxt
                if delta is not None and delta <= tol:
                    converged = True
                    break
        finally:
            if edges is not None:
                edges.unpersist()
            dangling.unpersist()
            seed_df.unpersist()
        # non-converged runs return the max_iter iterate — same contract as
        # pagerank's fixed-step mode (tol=0 callers rely on it)
        del converged
    return state.join(
        seed_df.select("_s", F.col(ID).alias("seed")), "_s"
    ).select("seed", ID, F.col("r").alias("pagerank"))


def related_nodes(
    graph: LinkGraph,
    seeds: list,
    k: int = 10,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> DataFrame:
    """DataFrame[seed, id, pagerank, rank] — each seed's k highest-PPR
    nodes, the seed itself excluded (rank 1 = most related; deterministic
    ties by ascending id). The per-seed top-k is a rank-limited window —
    Spark plans it as a map-side Partial WindowGroupLimit, the engine's
    blessed bounded top-k, never a full per-seed sort."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    ppr = personalized_pagerank_batch(
        graph, seeds, damping=damping, tol=tol, max_iter=max_iter
    )
    win = Window.partitionBy("seed").orderBy(F.desc("pagerank"), F.asc(ID))
    return (
        ppr.filter(F.col("seed") != F.col(ID))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )
