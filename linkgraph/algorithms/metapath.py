"""Metapath-constrained random walks over typed (heterogeneous) graphs.

NOT present in the reference (its walks are homogeneous —
``spark_randomwalker.py`` / node2vec); added because real link graphs are
typed (page/host/domain, repo/file/commit, user/product) and the standard
embedding recipe for them is metapath2vec (Dong, Chawla, Swami, KDD 2017,
public): walks that follow a caller-chosen TYPE SEQUENCE, e.g.
supplier → part → order, so the sampled contexts respect the schema
instead of diffusing across it.

Sampling is exact weighted-categorical via the GUMBEL-MAX trick on
md5-deterministic noise (the DSIR resampler's construction,
``pipeline/text.py``): per (walk, step, candidate),

    u60    = first 15 hex chars of md5("mp:<seed>:<walk>:<step>:<dst>")
    u      = (u60 + 0.5) / 2^60
    key    = ln(w) + (−ln(−ln u))

and the next node is argmax(key) — an ALGEBRAIC max(struct(key, dst)) per
walk, never a per-node window, so hub fan-outs spill across tasks under
the aggregate's partial combine. Deterministic: same graph + seed ⇒ same
walks on any engine (the DuckDB oracle replays the draws digit-for-digit).

Plan per step: one join of the walk state against the pinned TYPED edge
table (filtered to the step's (from_type → to_type) slice) + one
max-struct aggregate keyed by walk id. Steps = len(metapath) − 1; state is
one row per walk. Dead ends freeze (completed = false) rather than
resample — metapath2vec's convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def metapath_walks(
    graph: LinkGraph,
    node_types: DataFrame,
    metapath: list,
    walks_per_node: int = 1,
    seed: int = 42,
) -> DataFrame:
    """DataFrame[walk_id, start, path: array<string>, completed] — one row
    per (start-node-of-type-metapath[0] × replica). ``node_types``'s first
    two columns are (id, type); ``metapath`` is the type sequence (length
    ≥ 2). Edge weights bias the choice (gumbel-max over ln(w)); weights
    must be > 0 where a step can use the edge."""
    if len(metapath) < 2:
        raise ValueError("metapath needs at least two types")
    if walks_per_node <= 0:
        raise ValueError(f"walks_per_node must be > 0, got {walks_per_node}")
    spark = graph.edges.sparkSession
    tcols = node_types.columns
    types = node_types.select(
        F.col(tcols[0]).cast("string").alias("_tid"),
        F.col(tcols[1]).cast("string").alias("_tt"),
    )
    with static_plans(spark):
        w = graph.weight_col()
        tedges = pin_partitioned(
            graph.edges.select(
                F.col(SRC).cast("string").alias("u"),
                F.col(DST).cast("string").alias("v"),
                w.cast("double").alias("w"),
            )
            # multigraph convention: parallel (u, v) edges collapse to
            # their SUMMED weight before sampling — the draw probability is
            # then proportional to total(w), matching a true categorical
            # over distinct destinations. Without this, parallel edges to
            # the same dst share identical (walk, step, dst)-keyed gumbel
            # noise and the argmax degrades to max(w) semantics (ADVICE
            # r4). Same collapse convention as sssp/kpaths (which use min).
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
            # type joins v-side FIRST, u-side LAST: the final shuffle-hash
            # join leaves the table hash(u)-partitioned at npart — exactly
            # the pin's layout — so the former explicit repartition (a
            # fourth edge-sized exchange) is gone; the hints keep the
            # node-sized type table as build side instead of sort-merging
            # the edge table (guide §3.1, §2.4)
            .join(
                types.select(
                    F.col("_tid").alias("v"), F.col("_tt").alias("vt")
                ).hint("shuffle_hash"),
                "v",
            )
            .join(
                types.select(
                    F.col("_tid").alias("u"), F.col("_tt").alias("ut")
                ).hint("shuffle_hash"),
                "u",
            )
        )
        reps = spark.range(walks_per_node).select(
            F.col("id").cast("int").alias("_rep")
        )
        state = (
            types.filter(F.col("_tt") == str(metapath[0]))
            .select(F.col("_tid").alias("start"))
            .crossJoin(F.broadcast(reps))
            .select(
                F.concat_ws("#", "start", "_rep").alias("walk_id"),
                "start",
                F.array("start").alias("path"),
                F.col("start").alias("curr"),
            )
            .localCheckpoint(eager=True)
        )
        try:
            for step in range(len(metapath) - 1):
                ft, tt = str(metapath[step]), str(metapath[step + 1])
                cand = state.filter(F.col("curr").isNotNull()).hint(
                    "shuffle_hash"  # build the walk state, stream the edges
                ).join(
                    tedges.filter(
                        (F.col("ut") == ft) & (F.col("vt") == tt)
                    ),
                    state["curr"] == tedges["u"],
                )
                u60 = F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit("mp"),
                                F.lit(seed),
                                F.col("walk_id"),
                                F.lit(step),
                                F.col("v"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                u = (u60.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
                key = F.log(F.col("w")) + (-F.log(-F.log(u)))
                pick = (
                    cand.select(
                        "walk_id", F.struct(key.alias("k"), F.col("v")).alias("kv")
                    )
                    .groupBy("walk_id")
                    .agg(F.max("kv").alias("kv"))
                    .select("walk_id", F.col("kv.v").alias("_next"))
                )
                state = (
                    state.join(pick, "walk_id", "left")
                    .select(
                        "walk_id",
                        "start",
                        F.when(
                            F.col("_next").isNotNull(),
                            F.concat("path", F.array("_next")),
                        )
                        .otherwise(F.col("path"))
                        .alias("path"),
                        F.col("_next").alias("curr"),  # null freezes the walk
                    )
                    .localCheckpoint(eager=True)
                )
        finally:
            tedges.unpersist()
    return state.select(
        "walk_id",
        "start",
        "path",
        (F.size("path") == len(metapath)).alias("completed"),
    )


def pathsim(
    graph: LinkGraph,
    node_types: DataFrame,
    metapath: list,
    k: int | None = None,
    bridge_cap: int | None = None,
) -> DataFrame:
    """PathSim (Sun et al., VLDB 2011, public) — similarity between nodes
    of the SAME type under a symmetric 3-type metapath [T, B, T]:

        sim(x, y) = 2·C(x, y) / (C(x, x) + C(y, y)),
        C(x, y)   = Σ_b  n(x, b) · n(y, b)

    where n(x, b) counts T→B edges (parallel edges add). The standard
    "who is like me through shared collaborators/parts/hosts" measure —
    normalization by self-path counts removes the raw-degree bias that
    makes plain co-occurrence counts rank hubs first.

    EXACT (no sampling): C is one self-join of the (T, B, n) count table
    on the bridge column + one algebraic sum — the inverted-index shape
    every co-occurrence operator here uses. A bridge node shared by d
    T-nodes fans out d² pairs, so ``bridge_cap`` (drop bridges with
    > cap distinct T-neighbors — stop-word bridges carry no similarity
    signal anyway, exactly the dedup family's frequency-cap argument)
    bounds the join at scale; None keeps exactness. Only pairs with
    C > 0 emit — in canonical x < y order, or, with ``k`` set, expanded to
    BOTH orientations first so every node's top-k ranks over ALL its
    partners (sim desc, partner asc, rank-limited window)."""
    if len(metapath) != 3 or metapath[0] != metapath[2]:
        raise ValueError(
            f"pathsim needs a symmetric 3-type metapath [T, B, T], got {metapath}"
        )
    if k is not None and k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    tcols = node_types.columns
    types = node_types.select(
        F.col(tcols[0]).cast("string").alias("_tid"),
        F.col(tcols[1]).cast("string").alias("_tt"),
    )
    t_t, t_b = str(metapath[0]), str(metapath[1])
    e = (
        graph.edges.select(
            F.col(SRC).cast("string").alias("x"),
            F.col(DST).cast("string").alias("b"),
        )
        .join(
            types.select(F.col("_tid").alias("x"), F.col("_tt").alias("xt")), "x"
        )
        .join(
            types.select(F.col("_tid").alias("b"), F.col("_tt").alias("bt")), "b"
        )
        .filter((F.col("xt") == t_t) & (F.col("bt") == t_b))
        .groupBy("x", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    if bridge_cap is not None:
        keep = (
            e.groupBy("b")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") <= bridge_cap)
            .select("b")
        )
        e = e.join(keep, "b", "left_semi")
    # pin the (T, B, n) count table: selfc, the bridge self-join, and the
    # normalization all read it — unpinned, every reference re-runs the
    # whole node-typing upstream (plan audit measured 87 exchanges, 32 of
    # them the node-derivation hashpartitioning(id), zero reused); pinned,
    # the upstream runs once and downstream exchanges are count-table-sized
    from linkgraph.session import shuffle_partitions

    e = pin_partitioned(e.repartition(
        shuffle_partitions(graph.edges.sparkSession), "b"
    ))
    try:
        selfc = e.groupBy("x").agg(
            F.sum(F.col("n") * F.col("n")).alias("cself")
        )
        other = e.select(F.col("x").alias("y"), "b", F.col("n").alias("m"))
        cross = (
            e.join(other, "b")
            .filter(F.col("x") < F.col("y"))
            .groupBy("x", "y")
            .agg(F.sum(F.col("n") * F.col("m")).alias("cxy"))
        )
        out = (
            cross.join(selfc, "x")
            .join(
                selfc.select(
                    F.col("x").alias("y"), F.col("cself").alias("cy")
                ),
                "y",
            )
            .select(
                "x",
                "y",
                (2.0 * F.col("cxy") / (F.col("cself") + F.col("cy"))).alias(
                    "pathsim"
                ),
            )
        )
        if k is not None:
            from pyspark.sql import Window

            both = out.unionByName(
                out.select(
                    F.col("y").alias("x"), F.col("x").alias("y"), "pathsim"
                )
            )
            win = Window.partitionBy("x").orderBy(
                F.desc("pathsim"), F.asc("y")
            )
            out = (
                both.withColumn("rank", F.row_number().over(win))
                .filter(F.col("rank") <= k)
            )
        # materialize before releasing the pin (the metapath_walks
        # convention: the result must not stay lazy over a cache this
        # function is responsible for unpersisting — ADVICE-style leak
        # otherwise: one orphaned persisted table per pathsim call)
        return out.localCheckpoint(eager=True)
    finally:
        e.unpersist()
