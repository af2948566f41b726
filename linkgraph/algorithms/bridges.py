"""Bridges and 2-edge-connected components — spanning forest + XOR-tag cut
sketch, fully distributed.

NOT present in the reference (no cut/connectivity-structure utilities in
``mercury/graph``); added because bridge edges are the single points of
failure of a link graph (the one import whose removal disconnects a
dependency cluster, the one co-change edge holding two repo families
together) and 2-edge-connected components are the robust cores left when
those are removed.

Why not Tarjan low-link: the textbook algorithm needs a DFS tree (its
low-link argument only holds when every non-tree edge is a back edge),
and DFS is inherently sequential. The XOR sketch (the cycle-space random
tagging used in dynamic-connectivity literature, e.g. Kapron-King-Mountjoy
SODA'13) works over ANY spanning forest:

1. build a spanning forest T (Borůvka — O(log n) contraction rounds);
2. Euler-tour each tree (successor = next sorted neighbor, the tour cut
   at the component's min-id root) and pointer-double the successor list
   TWICE, ⌈log₂ 2n⌉ rounds each: pass A ranks every arc (its distance to
   the tour end — Tarjan–Vishkin list ranking, the machinery
   ``biconnectivity.py`` also uses), which orients every tree edge (the
   earlier arc of the pair is the parent→child "down" arc); pass B folds
   a suffix XOR of per-arc values down the same list;
3. give every NON-tree edge {u, v} a 60-bit md5 tag and XOR it into both
   endpoints' accumulators acc(·); the down arc p→c carries value
   acc(c), up arcs carry 0, so pass B's suffix XOR at the down and up
   arcs of c differ by exactly XOR of acc over subtree(c) — the XOR of
   tags of non-tree edges with EXACTLY ONE endpoint in the subtree
   (both-inside tags cancel, outside tags never enter);
4. the tree edge above node c is a bridge iff that XOR is 0 — no non-tree
   edge crosses the cut, w.h.p. (a NONEMPTY set of distinct md5 tags XORs
   to 0 with probability ~2^-60 per edge; deterministic given ``seed``).
   Non-tree edges are never bridges (they close a tree cycle).

Scale shape: the two doubling passes are arc-table self-joins —
2⌈log₂ 2n⌉ rounds REGARDLESS of tree height (the former BFS-root +
leaf-peel formulation paid 2 × forest-height rounds, unbounded on
path-shaped components — pagination or redirect chains); everything else
is one aggregate or one join. The Euler successor build materializes each
node's TREE-incident sorted neighbor list — tree-degree-sized rows, the
same bounded-array contract as ``biconnectivity.py``. No windows, no
UDFs, no driver-side graph.

Semantics: simple-graph (parallel edges collapse to one — same as
``networkx.bridges`` on ``Graph``); self-loops ignored; undirected only
(a directed bridge is a different object — raises ``ValueError``, same
contract as ``minimum_spanning_forest``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


def _canonical_simple_edges(graph: LinkGraph) -> DataFrame:
    """DataFrame[a, b] — distinct undirected edges, a < b, no self-loops."""
    return (
        graph.edges.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _root_forest(
    tree: DataFrame, roots: DataFrame, id_t: str, budget: int
) -> DataFrame:
    """BFS-root a spanning forest: ``tree[u, v]`` (both arc orientations,
    pre-pinned on ``u``), ``roots[id]`` → DataFrame[id, parent] covering
    every tree node (roots carry parent NULL). A tree node is reached
    exactly once, via its unique tree path — no dedup or tie-break needed
    beyond the settled check. Raises if the forest height exceeds
    ``budget`` (an engine bug, not an input property)."""
    settled = roots.select(
        ID, F.lit(None).cast(id_t).alias("parent")
    ).localCheckpoint(eager=True)
    frontier = settled
    for _ in range(budget + 1):
        nxt = (
            frontier.join(tree, frontier[ID] == tree["u"])
            .select(F.col("v").alias(ID), F.col("u").alias("parent"))
            .join(settled.select(ID), ID, "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            return settled
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(
        f"forest height exceeds max_hops={budget} — the spanning forest "
        "must be reachable from its roots; engine bug"
    )


def _euler_succ(arcs: DataFrame, roots: DataFrame) -> DataFrame:
    """DataFrame[au, av, su, sv] — Euler-tour successor per tree arc
    (``arcs`` = both orientations of the forest edges): succ((u, v)) =
    (v, next neighbor after u in sorted order at v); the arc whose
    successor would be the root's first arc terminates its tree's list
    (NULL successor). Shared logic with ``biconnectivity._tour_positions``
    — the bounded-tree-degree neighbor arrays are the same contract."""
    nb = (
        arcs.groupBy("u")
        .agg(F.sort_array(F.collect_list("v")).alias("ns"))
        .withColumnRenamed("u", "_nbu")
    )
    succ = arcs.join(nb, F.col("v") == F.col("_nbu")).select(
        F.col("u").alias("au"),
        F.col("v").alias("av"),
        F.col("v").alias("su"),
        F.element_at(
            "ns",
            (F.array_position("ns", F.col("u")) % F.size("ns") + 1).cast("int"),
        ).alias("sv"),
    )
    starts = roots.join(nb, roots[ID] == nb["_nbu"]).select(
        F.col("_nbu").alias("ru"), F.element_at("ns", 1).alias("rv")
    )
    return succ.join(
        starts,
        (succ["su"] == starts["ru"]) & (succ["sv"] == starts["rv"]),
        "left",
    ).select(
        "au",
        "av",
        F.when(F.col("ru").isNotNull(), F.lit(None)).otherwise(F.col("su")).alias(
            "su"
        ),
        F.when(F.col("ru").isNotNull(), F.lit(None)).otherwise(F.col("sv")).alias(
            "sv"
        ),
    )


def _list_fold(state: DataFrame, rounds: int, sum_col: str | None = None,
               xor_col: str | None = None) -> DataFrame:
    """Pointer-doubling fold down a successor list: ``state[au, av, su,
    sv, <val>]`` → after ⌈log₂ L⌉ rounds every row's value aggregates its
    whole suffix (self inclusive). ``sum_col`` folds with +, ``xor_col``
    with bitwise XOR. Each round is ONE arc-table self-join — round count
    is list-length-logarithmic, independent of tree shape.

    Rounds run in lazy EPOCHS of four: three rounds chain without any
    materialization (the whole epoch is one 8-exchange job), then the
    epoch end persists (PinnedGenerations) and localCheckpoints. The pin
    before each checkpoint is load-bearing twice over: (1) it keeps job
    count at 2 per 4 rounds instead of 1-2 per round (the fold is
    overhead-bound — each round moves only a few MB of arc rows); (2) a
    checkpoint-per-round self-join SQUARES the plan's sizeInBytes
    statistic every round (Spark 4 checkpoints preserve origin stats; a
    join's size estimate is the product of its children's), which after
    ~12 rounds produces BigIntegers of 100k+ digits and an
    ArithmeticException inside the JVM — checkpointing a just-pinned
    cache captures the REAL cached size instead, so estimates re-base
    every epoch."""
    from linkgraph.session import PinnedGenerations

    gens = PinnedGenerations()
    for rnd in range(rounds):
        cols = [c for c in (sum_col, xor_col) if c]
        s2 = state.select(
            F.col("au").alias("bu"),
            F.col("av").alias("bv"),
            F.col("su").alias("s2u"),
            F.col("sv").alias("s2v"),
            *[F.col(c).alias(f"_{c}2") for c in cols],
        )
        folded = []
        if sum_col:
            folded.append(
                (F.col(sum_col) + F.coalesce(f"_{sum_col}2", F.lit(0))).alias(
                    sum_col
                )
            )
        if xor_col:
            folded.append(
                F.col(xor_col)
                .bitwiseXOR(F.coalesce(f"_{xor_col}2", F.lit(0)))
                .alias(xor_col)
            )
        state = state.join(
            s2,
            (state["su"] == s2["bu"]) & (state["sv"] == s2["bv"]),
            "left",
        ).select(
            "au",
            "av",
            F.col("s2u").alias("su"),
            F.col("s2v").alias("sv"),
            *folded,
        )
        if (rnd + 1) % 4 == 0 or rnd == rounds - 1:
            state = gens.pin(state).localCheckpoint(eager=True)
            gens.release()
    return state


def bridges(
    graph: LinkGraph, seed: int = 42, max_hops: int | None = None
) -> DataFrame:
    """DataFrame[src, dst] — the bridge edges of an undirected graph, in
    canonical ``src < dst`` order.

    ``max_hops`` is accepted for API compatibility; the Euler-tour
    formulation's round count is ⌈log₂ 2n⌉ per doubling pass regardless of
    tree shape, so there is no height budget left to bound.
    """
    del max_hops  # height-independent since the Euler-tour rewrite
    if graph.is_directed:
        raise ValueError(
            "bridges requires an undirected graph (directed 2-edge-"
            "connectivity is a strong-connectivity problem)"
        )
    import math

    from linkgraph.algorithms.components import connected_components
    from linkgraph.algorithms.mst import minimum_spanning_forest

    spark = graph.edges.sparkSession
    id_t = graph.nodes.schema[ID].dataType.simpleString()
    empty = spark.createDataFrame([], f"{SRC} {id_t}, {DST} {id_t}")

    forest = minimum_spanning_forest(graph).select(
        F.col(SRC).alias("a"), F.col(DST).alias("b")
    )
    n_tree = forest.count()
    if n_tree == 0:
        return empty  # edge-free graph: nothing to cut

    with static_plans(spark):
        arcs = (
            forest.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(forest.select(F.col("b").alias("u"), F.col("a").alias("v")))
        )
        # roots = per-component min id; CC over the forest (n-1 edges) is
        # the cheap way to get them (isolated nodes have no arcs and no
        # tree edges to test)
        fg = LinkGraph(
            forest.select(F.col("a").alias(SRC), F.col("b").alias(DST)),
            nodes=graph.nodes,
            keys={"directed": False},
        )
        comp = connected_components(fg, with_sizes=False)
        roots = comp.select(F.col("component").alias(ID)).distinct()

        succ0 = _euler_succ(arcs, roots).localCheckpoint(eager=True)
        # rounds from the LARGEST tree, not the whole forest: each tree's
        # tour is its own successor list, so a fragmented forest (many
        # small components) needs only log2 of the biggest one
        max_tree = int(
            comp.groupBy("component")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .first()[0]
            or 2
        )
        rounds = max(1, math.ceil(math.log2(max(2, 2 * max_tree))))

        # pass A: list-rank the tour — dist = arcs from self to list end,
        # so the DOWN arc of a tree edge is the one with the LARGER dist
        pos = _list_fold(
            succ0.withColumn("dist", F.lit(1).cast("long")), rounds,
            sum_col="dist",
        )

        # 60-bit md5 tags on non-tree edges, XOR-folded per endpoint
        nontree = _canonical_simple_edges(graph).join(
            forest, ["a", "b"], "left_anti"
        )
        tagged = nontree.select(
            "a",
            "b",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit("bridge"), F.lit(seed), "a", "b")),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("tag"),
        )
        acc0 = (
            tagged.select(F.col("a").alias(ID), "tag")
            .unionByName(tagged.select(F.col("b").alias(ID), "tag"))
            .groupBy(ID)
            .agg(F.bit_xor("tag").alias("acc"))
        )

        # per-arc value: acc(child) on the down arc, 0 on the up arc —
        # orientation from pass A (mate self-join), acc broadcast-or-hash
        # joined on the arc head
        mate = pos.select(
            F.col("au").alias("av"), F.col("av").alias("au"),
            F.col("dist").alias("_mdist"),
        )
        oriented = pos.join(mate, ["au", "av"]).select(
            "au", "av", (F.col("dist") > F.col("_mdist")).alias("is_down")
        )
        vals = (
            succ0.join(oriented, ["au", "av"])
            .join(acc0.withColumnRenamed(ID, "av"), "av", "left")
            .select(
                "au",
                "av",
                "su",
                "sv",
                F.when(F.col("is_down"), F.coalesce("acc", F.lit(0)))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("x"),
            )
            .localCheckpoint(eager=True)
        )

        # pass B: suffix XOR down the same list; for tree edge {u, v} the
        # two arcs' suffix XORs differ by exactly the subtree XOR of the
        # child endpoint (module docstring step 3)
        sfx = _list_fold(vals, rounds, xor_col="x")
        smate = sfx.select(
            F.col("au").alias("av"), F.col("av").alias("au"),
            F.col("x").alias("_mx"),
        )
        out = (
            sfx.join(smate, ["au", "av"])
            .join(oriented, ["au", "av"])
            .filter(F.col("is_down") & (F.col("x").bitwiseXOR(F.col("_mx")) == 0))
            .select(
                F.least("au", "av").alias(SRC),
                F.greatest("au", "av").alias(DST),
            )
        )
        return out.localCheckpoint(eager=True)


def two_edge_connected_components(
    graph: LinkGraph, seed: int = 42, max_hops: int | None = None
) -> DataFrame:
    """DataFrame[id, component] — 2-edge-connected component per node,
    labeled by the component's min node id (bridges removed, then
    min-label connected components; isolated-by-removal nodes keep their
    own label)."""
    from linkgraph.algorithms.components import connected_components

    br = bridges(graph, seed=seed, max_hops=max_hops).select(
        F.col(SRC).alias("a"), F.col(DST).alias("b")
    )
    rest = _canonical_simple_edges(graph).join(br, ["a", "b"], "left_anti")
    g2 = LinkGraph(
        rest.select(F.col("a").alias(SRC), F.col("b").alias(DST)),
        nodes=graph.nodes,
        keys={"directed": False},
    )
    return connected_components(g2, with_sizes=False)
