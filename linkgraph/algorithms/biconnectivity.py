"""Biconnected components + articulation points — Tarjan–Vishkin in
DataFrames, fully distributed.

NOT present in the reference (``mercury/graph`` has no vertex-connectivity
structure at all); completes the cut-structure family: bridges
(:mod:`linkgraph.algorithms.bridges`) are the single-EDGE failure points,
articulation points the single-VERTEX ones, and biconnected components the
regions that survive any one vertex's removal.

Why not lowlink DFS: Tarjan's sequential algorithm needs a DFS tree. The
Tarjan–Vishkin PRAM algorithm (STOC'84 / SICOMP'85) works over ANY
spanning forest, which is what makes it expressible as DataFrame
supersteps:

1. spanning forest (Borůvka) + BFS rooting (shared with ``bridges.py``);
2. Euler tour of each tree: per node, incident tree arcs in sorted
   neighbor order; ``succ((u,v)) = (v, next neighbor after u at v)``; the
   arc closing the tour at the root gets succ NULL;
3. pointer-doubling list ranking gives each arc its tour position in
   ⌈log₂ 2n⌉ rounds — positions need not be dense, only ORDERED, so
   ``pos = −(distance to tour end)`` suffices; then
   ``first(v) = pos(p(v)→v)``, ``last(v) = pos(v→p(v))`` and
   "u ∈ subtree(v)" is the interval test first(v) ≤ first(u) ≤ last(v);
4. low(v)/high(v) = min/max of first() over endpoints one non-tree hop
   from subtree(v) (and v itself) — the same leaf-peel as ``bridges.py``
   with min/max instead of XOR (all algebraic, map-side combinable);
5. auxiliary graph on the NON-ROOT nodes (node w stands for its parent
   edge (p(w), w)):
     rule 1 — non-tree edge {v, w}, neither an ancestor of the other:
              aux edge v—w;
     rule 2 — tree edge (v, w), v = p(w), v non-root: aux edge v—w iff
              low(w) < first(v) OR high(w) > last(v)
   (back edges need no rule of their own: they are exactly what low/high
   summarize — roots' ±∞ intervals make rule 2 false above them, which is
   correct because a root has no parent edge);
6. connected components of the auxiliary graph = biconnected components;
   a non-tree edge takes the block of its deeper endpoint (for unrelated
   endpoints rule 1 makes both blocks equal); v (non-root) is an
   articulation point iff some child's block differs from v's own, a root
   iff its children span ≥ 2 blocks; a block containing exactly one edge
   is a bridge.

Scale shape: list ranking is the classic PRAM tradeoff — O(n log n) total
traffic across ⌈log₂ 2n⌉ self-join rounds of an arc-sized (2(n−1) rows)
table; every other step is one frontier join or one algebraic aggregate,
node-sized state. Hub boundary (documented, not hidden): the Euler-tour
successor build materializes each node's TREE-incident neighbor list as
one sorted array (the irreducible per-node sequential structure of a
tour) — tree-degree-sized rows, same bounded-array contract as
``negative.py``; binarizing high-degree tree nodes is the known fix and a
non-goal here. Undirected, simple-graph semantics, like ``bridges.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans

_INF = 1 << 62


def _tour_positions(
    arcs: DataFrame, roots: DataFrame, n_arcs: int
) -> DataFrame:
    """DataFrame[au, av, pos] — tour order per arc via pointer-doubling
    list ranking; positions ascend along each tree's Euler tour (they are
    NOT dense — only their order matters)."""
    nb = (
        arcs.groupBy("u")
        .agg(F.sort_array(F.collect_list("v")).alias("ns"))
        .withColumnRenamed("u", "_nbu")
    )
    succ = (
        arcs.join(nb, F.col("v") == F.col("_nbu"))
        .select(
            F.col("u").alias("au"),
            F.col("v").alias("av"),
            F.col("v").alias("su"),
            F.element_at(
                "ns",
                (F.array_position("ns", F.col("u")) % F.size("ns") + 1).cast(
                    "int"
                ),
            ).alias("sv"),
        )
    )
    # the arc whose successor is the tour's start (root -> its first
    # neighbor) terminates the list
    starts = roots.join(nb, roots[ID] == nb["_nbu"]).select(
        F.col("_nbu").alias("ru"), F.element_at("ns", 1).alias("rv")
    )
    state = (
        succ.join(
            starts,
            (succ["su"] == starts["ru"]) & (succ["sv"] == starts["rv"]),
            "left",
        )
        .select(
            "au",
            "av",
            F.when(F.col("ru").isNotNull(), F.lit(None)).otherwise(
                F.col("su")
            ).alias("su"),
            F.when(F.col("ru").isNotNull(), F.lit(None)).otherwise(
                F.col("sv")
            ).alias("sv"),
            F.lit(1).cast("long").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    rounds = max(1, math.ceil(math.log2(max(2, n_arcs))))
    # shared doubling fold (bridges._list_fold): per-round persist re-bases
    # plan statistics to real cached sizes — a checkpoint-per-round
    # self-join SQUARES sizeInBytes every round (Spark 4 checkpoints
    # preserve origin stats) until the JVM's big-number paths throw
    from linkgraph.algorithms.bridges import _list_fold

    state = _list_fold(
        state.withColumn("dist", F.col("dist").cast("long")), rounds,
        sum_col="dist",
    )
    return state.select("au", "av", (-F.col("dist")).alias("pos"))


def _biconn(graph: LinkGraph, max_hops: int | None = None):
    """Shared pipeline → (edge_labels[src, dst, component],
    parents[id, parent], blocks[id, block]) or None for edge-free
    graphs."""
    if graph.is_directed:
        raise ValueError(
            "biconnectivity requires an undirected graph (directed "
            "2-vertex-connectivity is a different object)"
        )
    from linkgraph.algorithms.bridges import (
        _canonical_simple_edges,
        _root_forest,
    )
    from linkgraph.algorithms.components import connected_components
    from linkgraph.algorithms.mst import minimum_spanning_forest

    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    id_t = graph.nodes.schema[ID].dataType.simpleString()

    forest = minimum_spanning_forest(graph).select(
        F.col(SRC).alias("a"), F.col(DST).alias("b")
    )
    if forest.isEmpty():
        return None
    budget = max_hops if max_hops is not None else graph.number_of_nodes()

    with static_plans(spark):
        arcs = pin_partitioned(
            forest.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(
                forest.select(F.col("b").alias("u"), F.col("a").alias("v"))
            )
            .repartition(npart, "u")
        )
        fg = LinkGraph(
            forest.select(F.col("a").alias(SRC), F.col("b").alias(DST)),
            nodes=graph.nodes,
            keys={"directed": False},
        )
        comp = connected_components(fg, with_sizes=False)
        roots = comp.select(F.col("component").alias(ID)).distinct()
        try:
            parents = _root_forest(arcs, roots, id_t, budget)
        except RuntimeError:
            arcs.unpersist()
            raise
        n_arcs = 2 * forest.count()
        pos = _tour_positions(arcs, roots, n_arcs)
        arcs.unpersist()

        nonroot = parents.filter(F.col("parent").isNotNull())
        fv = nonroot.join(
            pos, (nonroot["parent"] == pos["au"]) & (nonroot[ID] == pos["av"])
        ).select(ID, "parent", F.col("pos").alias("first"))
        lv = nonroot.join(
            pos, (nonroot[ID] == pos["au"]) & (nonroot["parent"] == pos["av"])
        ).select(nonroot[ID].alias("_id2"), F.col("pos").alias("last"))
        iv = (
            fv.join(lv, fv[ID] == lv["_id2"])
            .select(ID, "parent", "first", "last")
            .unionByName(
                parents.filter(F.col("parent").isNull()).select(
                    ID,
                    "parent",
                    F.lit(-_INF).alias("first"),
                    F.lit(_INF).alias("last"),
                )
            )
            .localCheckpoint(eager=True)
        )

        # low/high leaf-peel: base = first(v) plus firsts of one-non-tree-
        # hop neighbors, folded to the subtree min/max on the way up
        nontree = _canonical_simple_edges(graph).join(
            forest, ["a", "b"], "left_anti"
        )
        firsts = iv.select(F.col(ID).alias("_n"), F.col("first").alias("_f"))
        touch = (
            nontree.join(firsts, nontree["b"] == firsts["_n"])
            .select(F.col("a").alias(ID), F.col("_f"))
            .unionByName(
                nontree.join(firsts, nontree["a"] == firsts["_n"]).select(
                    F.col("b").alias(ID), F.col("_f")
                )
            )
            .groupBy(ID)
            .agg(F.min("_f").alias("_lo"), F.max("_f").alias("_hi"))
        )
        kids = (
            nonroot.groupBy("parent")
            .agg(F.count("*").alias("nkids"))
            .withColumnRenamed("parent", ID)
        )
        state = (
            iv.join(touch, ID, "left")
            .join(kids, ID, "left")
            .select(
                ID,
                "parent",
                F.least(F.col("first"), F.coalesce("_lo", F.lit(_INF))).alias(
                    "lo"
                ),
                F.greatest(
                    F.col("first"), F.coalesce("_hi", F.lit(-_INF))
                ).alias("hi"),
                F.coalesce("nkids", F.lit(0)).alias("pending"),
            )
            .localCheckpoint(eager=True)
        )
        lowhigh: DataFrame | None = None
        for _ in range(budget + 1):
            ready = state.filter(
                (F.col("pending") == 0) & F.col("parent").isNotNull()
            ).localCheckpoint(eager=True)
            if ready.limit(1).count() == 0:
                break
            done = ready.select(ID, "lo", "hi")
            lowhigh = done if lowhigh is None else lowhigh.unionByName(done)
            lowhigh = lowhigh.localCheckpoint(eager=False)
            push = (
                ready.groupBy("parent")
                .agg(
                    F.min("lo").alias("plo"),
                    F.max("hi").alias("phi"),
                    F.count("*").alias("pc"),
                )
                .withColumnRenamed("parent", ID)
            )
            state = (
                state.join(ready.select(ID), ID, "left_anti")
                .join(push, ID, "left")
                .select(
                    ID,
                    "parent",
                    F.least("lo", F.coalesce("plo", F.lit(_INF))).alias("lo"),
                    F.greatest("hi", F.coalesce("phi", F.lit(-_INF))).alias(
                        "hi"
                    ),
                    (F.col("pending") - F.coalesce("pc", F.lit(0))).alias(
                        "pending"
                    ),
                )
                .localCheckpoint(eager=True)
            )
        else:
            raise RuntimeError(
                f"low/high peel did not drain within max_hops={budget} "
                "rounds — every tree peels in height rounds; engine bug"
            )

        # auxiliary graph on non-root nodes (node w stands for edge
        # (p(w), w)); intervals decide relatedness
        ia = iv.select(
            F.col(ID).alias("_xa"),
            F.col("first").alias("fa"),
            F.col("last").alias("la"),
        )
        ib = iv.select(
            F.col(ID).alias("_xb"),
            F.col("first").alias("fb"),
            F.col("last").alias("lb"),
        )
        nt = (
            nontree.join(ia, nontree["a"] == ia["_xa"])
            .join(ib, nontree["b"] == ib["_xb"])
            .select(
                "a",
                "b",
                (
                    (F.col("fa") <= F.col("fb")) & (F.col("fb") <= F.col("la"))
                ).alias("b_in_a"),
                (
                    (F.col("fb") <= F.col("fa")) & (F.col("fa") <= F.col("lb"))
                ).alias("a_in_b"),
            )
            .localCheckpoint(eager=True)
        )
        rule1 = nt.filter(~F.col("b_in_a") & ~F.col("a_in_b")).select(
            F.col("a").alias(SRC), F.col("b").alias(DST)
        )
        lh = (lowhigh if lowhigh is not None else spark.createDataFrame(
            [], f"{ID} {id_t}, lo long, hi long"
        ))
        pv = iv.select(
            F.col(ID).alias("_pv"),
            F.col("first").alias("pf"),
            F.col("last").alias("pl"),
        )
        rule2 = (
            nonroot.join(lh, ID)
            .join(pv, F.col("parent") == F.col("_pv"))
            .filter(
                (F.col("lo") < F.col("pf")) | (F.col("hi") > F.col("pl"))
            )
            .select(F.col(ID).alias(SRC), F.col("parent").alias(DST))
        )
        aux_nodes = nonroot.select(ID)
        blocks = connected_components(
            LinkGraph(
                rule1.unionByName(rule2), nodes=aux_nodes, keys={"directed": False}
            ),
            with_sizes=False,
        ).select(ID, F.col("component").alias("block"))

        # edge labels: tree edge (p(w), w) -> block(w); non-tree edge ->
        # block of its deeper endpoint (unrelated: rule 1 made them equal)
        bl = blocks.select(F.col(ID).alias("_bn"), F.col("block"))
        tree_lab = (
            nonroot.join(bl, nonroot[ID] == bl["_bn"])
            .select(
                F.least(ID, "parent").alias(SRC),
                F.greatest(ID, "parent").alias(DST),
                F.col("block").alias("component"),
            )
        )
        nt_deep = nt.select(
            "a",
            "b",
            F.when(F.col("b_in_a"), F.col("b")).otherwise(F.col("a")).alias(
                "_deep"
            ),
        )
        nt_lab = nt_deep.join(bl, nt_deep["_deep"] == bl["_bn"]).select(
            F.col("a").alias(SRC),
            F.col("b").alias(DST),
            F.col("block").alias("component"),
        )
        edge_labels = tree_lab.unionByName(nt_lab).localCheckpoint(eager=True)
        return edge_labels, parents, blocks


def biconnected_components(
    graph: LinkGraph, max_hops: int | None = None
) -> DataFrame:
    """DataFrame[src, dst, component] — one row per canonical simple edge,
    labeled by its biconnected component (label = min non-root node id
    among the block's tree-edge child endpoints). A block with exactly one
    edge is a bridge."""
    res = _biconn(graph, max_hops)
    if res is None:
        spark = graph.edges.sparkSession
        id_t = graph.nodes.schema[ID].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{SRC} {id_t}, {DST} {id_t}, component {id_t}"
        )
    return res[0]


def articulation_points_distributed(
    graph: LinkGraph, max_hops: int | None = None
) -> DataFrame:
    """DataFrame[id] — articulation points via Tarjan–Vishkin blocks: a
    non-root node whose children span a block different from its own
    parent edge's, or a root whose children span ≥ 2 blocks."""
    res = _biconn(graph, max_hops)
    spark = graph.edges.sparkSession
    id_t = graph.nodes.schema[ID].dataType.simpleString()
    if res is None:
        return spark.createDataFrame([], f"{ID} {id_t}")
    _, parents, blocks = res
    nonroot = parents.filter(F.col("parent").isNotNull())
    child_blocks = nonroot.join(blocks, ID).select(
        F.col("parent").alias(ID), F.col("block")
    )
    own = blocks.select(ID, F.col("block").alias("own_block"))
    is_root = parents.select(
        ID, F.col("parent").isNull().alias("is_root")
    )
    agg = (
        child_blocks.join(own, ID, "left")  # roots have no own block
        .join(is_root, ID)
        .groupBy(ID)
        .agg(
            F.countDistinct("block").alias("nblocks"),
            F.max(F.col("block") != F.col("own_block")).alias("differs"),
            F.first("is_root").alias("is_root"),
        )
    )
    return agg.filter(
        (F.col("is_root") & (F.col("nblocks") >= 2))
        | (~F.col("is_root") & F.coalesce("differs", F.lit(False)))
    ).select(ID)
