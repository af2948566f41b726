"""Louvain community detection — parallel-reassignment variant with
resolution γ, from scratch on DataFrame ops.

Same math as the reference's ``LouvainCommunities``
(``mercury/graph/ml/louvain.py:19-597``), reimplemented: per-iteration
move gain for node x from community Cx to neighboring Cj

    mdq = Σ_{i∈Cj} A_xi − Σ_{i∈Cx\\{x}} A_xi
          − k_x/(2m) · (ΣK_Cj − ΣK_Cx + k_x)              (louvain.py:531-541)

best move per node via row_number over (id, desc(mdq)); symmetric swaps
(x: C1→C2 while y: C2→C1) broken by ranking over the unordered community
pair sort_array(array(c, cj)) and requiring mdq > 1e-4 (louvain.py:556-574).
Passes coarsen the graph by groupBy(cSrc, cDst).sum(weight)
(louvain.py:201-207) and stop when the modularity gain drops below
``min_modularity_gain``; modularity = k_in/m − γ·(1/(2m))²·Σ_c(Σ_i k_i)²
(louvain.py:398-448).

Deviations from the reference (documented, all scale-motivated):
- no global ``row_number().over(Window.orderBy("id"))`` id-anonymization
  (louvain.py:129 — a single-partition window); original node ids are used
  as community labels directly, so labels are node ids (exact up to
  relabeling, as BASELINE.json:6 requires).
- ``m`` keeps its float value (reference truncates to int, louvain.py:396 —
  identical on integer weights, exact on float weights).
- deterministic tie-breaks: secondary sort on community id / node id where
  the reference leaves row_number ties to partition order.
- per-iteration lineage break via localCheckpoint (the reference's
  checkpoint() at louvain.py:172), single convergence action per iteration.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


@dataclass
class LouvainResult:
    labels: DataFrame  # [id, cluster] (+ pass0..passN when all_partitions)
    modularity: float
    passes: int


def _check_no_duplicates(edges: DataFrame):
    dup = (
        edges.groupBy(SRC, DST)
        .agg(F.count(F.lit(1)).alias("n"))
        .where("n > 1")
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError("Data has duplicated entries.")  # louvain.py:268


def _label_degrees(edges, partition):
    """(id, c, degree) — union endpoints instead of double join
    (louvain.py:289-331)."""
    deg = (
        edges.selectExpr(f"{SRC} as id", "weight")
        .unionByName(edges.selectExpr(f"{DST} as id", "weight"))
        .groupBy("id")
        .agg(F.sum("weight").alias("degree"))
    )
    return partition.join(deg, "id", "inner").select("id", "c", "degree")


def _label_edges(edges, partition):
    """edges + (cSrc, cDst) community labels (louvain.py:333-377)."""
    return (
        edges.select(SRC, DST, "weight")
        .join(partition.selectExpr(f"id as {SRC}", "c as cSrc"), SRC, "left")
        .join(partition.selectExpr(f"id as {DST}", "c as cDst"), DST, "left")
    )


def _modularity(edges, partition, m, resolution) -> float:
    le = _label_edges(edges, partition)
    ld = _label_degrees(edges, partition)
    k_in = le.where("cSrc = cDst").agg(F.sum("weight")).collect()[0][0] or 0.0
    k_out = (
        ld.groupBy("c")
        .agg(F.sum("degree").alias("kC"))
        .agg(F.sum(F.col("kC") * F.col("kC")))
        .collect()[0][0]
        or 0.0
    )
    norm = 1.0 / (2.0 * m)
    return (k_in / m) - (norm**2) * resolution * float(k_out)


def _reassign_all(edges, partition, m, move_threshold=1e-4):
    """One parallel reassignment round (louvain.py:450-576)."""
    ld = _label_degrees(edges, partition)
    le = _label_edges(edges, partition)

    intra = le.where(f"({SRC} != {DST}) and (cSrc = cDst)")
    cx_aix = (
        intra.selectExpr(f"{SRC} as id", "weight")
        .unionByName(intra.selectExpr(f"{DST} as id", "weight"))
        .groupBy("id")
        .agg(F.sum("weight").alias("cx_sum_aix"))
    )
    inter = le.where("cSrc != cDst")
    cj_aix = (
        inter.selectExpr(f"{SRC} as id", "cDst as cj", "weight")
        .unionByName(inter.selectExpr(f"{DST} as id", "cSrc as cj", "weight"))
        .groupBy("id", "cj")
        .agg(F.sum("weight").alias("cj_sum_aix"))
    )
    # Community total degree, used on both sides of the move gain. As an
    # algebraic aggregate it map-side combines; the former
    # sum(degree) over (partitionBy(c)) window concentrated every member
    # row of a community in one task — after a pass or two communities are
    # huge, which is exactly the skew shape this engine de-windowed
    # everywhere else.
    c_ki = ld.groupBy("c").agg(F.sum("degree").alias("c_sum_ki"))
    cj_ki = c_ki.selectExpr("c as cj", "c_sum_ki as cj_sum_ki")

    dq = (
        ld.join(c_ki.withColumnRenamed("c_sum_ki", "cx_sum_ki"), "c")
        .join(cx_aix, "id", "left")
        .join(cj_aix, "id", "left")
        .join(cj_ki, "cj", "left")
        .withColumn(
            "mdq",
            F.coalesce("cj_sum_aix", F.lit(0.0))
            - F.coalesce("cx_sum_aix", F.lit(0.0))
            - (
                F.col("degree")
                / F.lit(2.0 * m)
                * (F.col("cj_sum_ki") - F.col("cx_sum_ki") + F.col("degree"))
            ),
        )
        .select(
            "id",
            "c",
            F.coalesce("cj", F.col("c")).alias("cj"),  # trapped nodes
            "mdq",
            F.row_number()
            .over(Window.partitionBy("id").orderBy(F.desc("mdq"), F.asc("cj")))
            .alias("mdq_rank"),
        )
        .where(F.col("mdq_rank") == 1)
    )

    return (
        dq.withColumn(
            "sym_rank",
            F.row_number().over(
                Window.partitionBy(
                    F.sort_array(F.array(F.col("c"), F.col("cj")))
                ).orderBy(F.desc("mdq"), F.asc("id"))
            ),
        )
        .withColumn(
            "cStar",
            F.when(
                (F.col("mdq") > F.lit(move_threshold)) & (F.col("sym_rank") == 1),
                F.col("cj"),
            ).otherwise(F.col("c")),
        )
        .selectExpr("id", "c as cx", "cStar as cj")
    )


def louvain_communities(
    graph: LinkGraph,
    min_modularity_gain: float = 1e-3,
    max_pass: int = 2,
    max_iter: int = 10,
    resolution: float = 1.0,
    all_partitions: bool = False,
    checkpoint=None,
    checkpoint_interval: int = 2,
    max_supersteps: int | None = None,
    resume: bool = False,
) -> LouvainResult:
    """Fit Louvain on an undirected graph given as single-stored edges
    (each undirected edge appears once; weights optional).

    ``checkpoint``/``resume`` complete the resumability story
    (BASELINE.json:14) for the fourth and last iterative loop (after
    pagerank, two-star CC and LPA): every ``checkpoint_interval`` inner
    reassignment iterations the full cross-pass state — coarsened ``edges``,
    the per-pass label accumulator ``ret`` and the in-pass partition ``p1``
    — is snapshotted through a :class:`linkgraph.checkpoint.CheckpointManager`
    together with scalar loop state (pass index, inner iteration, ``m``,
    last modularity, per-step moved-node counts). ``resume=True`` continues
    mid-pass; the reassignment has deterministic tie-breaks, so a resumed
    run is bit-exact with an uninterrupted one. ``max_supersteps`` is a
    global inner-iteration budget across passes (a clean kill switch for
    budget-limited runs): when exhausted the run snapshots its state (if a
    manager is set) and returns the best completed-pass labels so far."""
    if resolution < 0:
        raise ValueError(f"Resolution value is {resolution} and cannot be < 0.")
    with static_plans(graph.edges.sparkSession):
        return _louvain_loop(
            graph,
            min_modularity_gain,
            max_pass,
            max_iter,
            resolution,
            all_partitions,
            checkpoint,
            checkpoint_interval,
            max_supersteps,
            resume,
        )


def _finish(ret: DataFrame, modularity: float, n_pass: int, all_partitions: bool):
    pass_cols = sorted(
        (c for c in ret.columns if c.startswith("pass")),
        key=lambda c: int(c.replace("pass", "")),
    )
    last = pass_cols[-1]
    if all_partitions:
        labels = ret.select(["id"] + pass_cols).withColumn("cluster", F.col(last))
    else:
        labels = ret.select("id", F.col(last).alias("cluster"))
    return LouvainResult(labels=labels, modularity=modularity, passes=n_pass)


def _louvain_loop(
    graph,
    min_modularity_gain,
    max_pass,
    max_iter,
    resolution,
    all_partitions,
    checkpoint,
    checkpoint_interval,
    max_supersteps,
    resume,
):
    gstep = 0
    history: list[dict] = []
    p1 = None
    it = 0
    if resume and checkpoint is not None and checkpoint.latest_step() is not None:
        gstep = checkpoint.latest_step()
        met = checkpoint.manifest(gstep)["metrics"]
        ret = checkpoint.load(gstep, "ret").localCheckpoint(eager=True)
        if met.get("done"):
            return _finish(ret, met["modularity0"], met["n_pass"], all_partitions)
        edges = checkpoint.load(gstep, "edges").localCheckpoint(eager=True)
        p1 = checkpoint.load(gstep, "p1").localCheckpoint(eager=True)
        m = float(met["m"])
        modularity0 = float(met["modularity0"])
        n_pass = int(met["n_pass"])
        it = int(met["it"])
        history = met.get("history", [])
    else:
        edges = graph.edges.select(SRC, DST, graph.weight_col().alias("weight"))
        _check_no_duplicates(edges)
        edges = edges.localCheckpoint(eager=True)

        nodes0 = (
            edges.selectExpr(f"{SRC} as id")
            .unionByName(edges.selectExpr(f"{DST} as id"))
            .distinct()
        )
        # ret accumulates the community of each ORIGINAL node per pass
        ret = nodes0.withColumn("pass0", F.col("id")).localCheckpoint(eager=True)

        m = float(edges.agg(F.sum("weight")).collect()[0][0])
        modularity0 = -1.0
        n_pass = 0

    def _save(done: bool):
        tables = {"ret": ret} if done else {"ret": ret, "edges": edges, "p1": p1}
        checkpoint.save(
            gstep,
            tables,
            {
                "done": done,
                "m": m,
                "modularity0": modularity0,
                "n_pass": n_pass,
                "it": it,
                "history": history,
            },
        )

    budget_left = None if max_supersteps is None else max(0, max_supersteps - gstep)

    can_pass = True
    while can_pass:
        if p1 is None:
            p1 = (
                edges.selectExpr(f"{SRC} as id")
                .unionByName(edges.selectExpr(f"{DST} as id"))
                .distinct()
                .withColumn("c", F.col("id"))
            )
            it = 0
        while it < max_iter:
            if budget_left is not None and budget_left <= 0:
                # budget kill switch: snapshot mid-pass and hand back the
                # labels of the last COMPLETED pass (ret is pass-granular)
                if checkpoint is not None:
                    _save(done=False)
                return _finish(
                    ret, modularity0, n_pass, all_partitions
                )
            p2 = _reassign_all(edges, p1, m).localCheckpoint(eager=False)
            if checkpoint is not None:
                # moved-node count is Louvain's convergence metric; only
                # computed when a manager records it (otherwise the cheaper
                # existence probe keeps the hot path unchanged)
                n_moved = p2.where("cx != cj").count()
                moved = n_moved > 0
            else:
                n_moved = None
                moved = p2.where("cx != cj").limit(1).count() > 0
            if not moved:
                break
            p1 = p2.selectExpr("id", "cj as c")
            it += 1
            gstep += 1
            if budget_left is not None:
                budget_left -= 1
            if checkpoint is not None:
                history.append(
                    {"step": gstep, "pass": n_pass, "it": it, "moved": int(n_moved)}
                )
                if it % checkpoint_interval == 0:
                    _save(done=False)

        modularity1 = _modularity(edges, p1, m, resolution)
        can_pass = (modularity1 - modularity0 > min_modularity_gain) and (
            n_pass < max_pass
        )
        modularity0 = modularity1

        if can_pass:
            ret = ret.join(
                p1.selectExpr(f"id as pass{n_pass}", f"c as pass{n_pass + 1}"),
                f"pass{n_pass}",
            ).localCheckpoint(eager=True)
            edges = (
                _label_edges(edges, p1)
                .groupBy("cSrc", "cDst")
                .agg(F.sum("weight").alias("weight"))
                .selectExpr(f"cSrc as {SRC}", f"cDst as {DST}", "weight")
            ).localCheckpoint(eager=True)
        n_pass += 1
        p1 = None

    if checkpoint is not None:
        _save(done=True)
    return _finish(ret, modularity0, n_pass, all_partitions)


def split_disconnected_communities(graph, labels, id_col="id", label_col="label"):
    """Leiden-motivated connectivity repair (Traag, Waltman & van Eck 2019,
    "From Louvain to Leiden"): Louvain's local-moving phase can leave a
    community whose induced subgraph is DISCONNECTED — the defect the Leiden
    refinement phase exists to fix. This post-pass splits every such
    community into its connected components, which is always
    modularity-INCREASING (splitting C = A ⊎ B with no A–B edges changes Q
    by +2·γ·vol(A)·vol(B)/(2m)² > 0) and yields Leiden's connectivity
    guarantee for any input partition.

    Returns DataFrame[id, label] with label = the component's min node id
    within its original community (globally unique: components are
    disjoint node sets). Nodes isolated inside their community become
    singletons. The heavy pass is one intra-community edge filter (two
    broadcastable label joins) followed by the engine's distributed
    two-star connected components on that subgraph — no window, no Python.
    """
    from linkgraph.algorithms.components import connected_components
    from linkgraph.graph import DST, ID, SRC, LinkGraph

    lab = labels.select(F.col(id_col).alias(ID), F.col(label_col).alias("_lab"))
    intra = (
        graph.edges.select(SRC, DST)
        .join(lab.select(F.col(ID).alias(SRC), F.col("_lab").alias("_ls")), SRC)
        .join(lab.select(F.col(ID).alias(DST), F.col("_lab").alias("_ld")), DST)
        .filter(F.col("_ls") == F.col("_ld"))
        .select(SRC, DST)
    )
    sub = LinkGraph(intra, keys={"directed": False})
    cc = connected_components(sub, with_sizes=False)
    return (
        lab.join(cc, ID, "left")
        .select(ID, F.coalesce(F.col("component"), F.col(ID)).alias("label"))
    )
