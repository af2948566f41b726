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
2. root each tree at its component's min node id; BFS over tree edges
   gives (parent, depth) — a node's tree path is unique, so no
   tie-breaking is ever needed;
3. give every NON-tree edge {u, v} a 60-bit md5 tag and XOR it into both
   endpoints' accumulators;
4. leaf-peel the forest: each node, once all children are peeled, pushes
   its accumulated XOR to its parent; the value a node holds when peeled
   is the XOR of tags of non-tree edges with EXACTLY ONE endpoint in its
   subtree (both-inside tags cancel, outside tags never enter);
5. the tree edge above node c is a bridge iff that XOR is 0 — no non-tree
   edge crosses the cut, w.h.p. (a NONEMPTY set of distinct md5 tags XORs
   to 0 with probability ~2^-60 per edge; deterministic given ``seed``).
   Non-tree edges are never bridges (they close a tree cycle).

Scale shape: every round is one frontier join against a pinned
hash-partitioned tree-adjacency table + one algebraic aggregate — the
same rank-side-only-shuffle plan as ``closeness.shortest_path_lengths``;
state is node-sized throughout. Round count = O(Borůvka log n) +
2 × (forest height). No windows, no UDFs, no driver-side graph.

Semantics: simple-graph (parallel edges collapse to one — same as
``networkx.bridges`` on ``Graph``); self-loops ignored; undirected only
(a directed bridge is a different object — raises ``ValueError``, same
contract as ``minimum_spanning_forest``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


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


def _peel_round(state: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One leaf-peel round over ``state[id, parent, acc, pending]`` →
    (ready, next_state). Algebraic only: a bit_xor groupBy on the ready
    children + one left_anti + one left join — no window ever sees a
    node's whole child set in one task."""
    ready = state.filter((F.col("pending") == 0) & F.col("parent").isNotNull())
    push = (
        ready.groupBy("parent")
        .agg(F.bit_xor("acc").alias("px"), F.count("*").alias("pc"))
        .withColumnRenamed("parent", ID)
    )
    nxt = (
        state.join(ready.select(ID), ID, "left_anti")
        .join(push, ID, "left")
        .select(
            ID,
            "parent",
            F.when(
                F.col("px").isNotNull(), F.col("acc").bitwiseXOR(F.col("px"))
            )
            .otherwise(F.col("acc"))
            .alias("acc"),
            (F.col("pending") - F.coalesce("pc", F.lit(0))).alias("pending"),
        )
    )
    return ready, nxt


def bridges(
    graph: LinkGraph, seed: int = 42, max_hops: int | None = None
) -> DataFrame:
    """DataFrame[src, dst] — the bridge edges of an undirected graph, in
    canonical ``src < dst`` order.

    ``max_hops`` bounds the BFS-rooting / leaf-peel rounds (both equal the
    forest height); default is the node count — hitting it means an engine
    bug, reported loudly rather than looping.
    """
    if graph.is_directed:
        raise ValueError(
            "bridges requires an undirected graph (directed 2-edge-"
            "connectivity is a strong-connectivity problem)"
        )
    from linkgraph.algorithms.components import connected_components
    from linkgraph.algorithms.mst import minimum_spanning_forest

    spark = graph.edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    id_t = graph.nodes.schema[ID].dataType.simpleString()
    empty = spark.createDataFrame([], f"{SRC} {id_t}, {DST} {id_t}")

    forest = minimum_spanning_forest(graph).select(
        F.col(SRC).alias("a"), F.col(DST).alias("b")
    )
    if forest.isEmpty():
        return empty  # edge-free graph: nothing to cut
    budget = max_hops if max_hops is not None else graph.number_of_nodes()

    with static_plans(spark):
        tree = pin_partitioned(
            forest.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(forest.select(F.col("b").alias("u"), F.col("a").alias("v")))
            .repartition(npart, "u")
        )
        # roots = per-component min id; CC over the forest (n-1 edges) is
        # the cheap way to get them and covers isolated nodes via the node
        # table (their trees are single roots with nothing to peel)
        fg = LinkGraph(
            forest.select(F.col("a").alias(SRC), F.col("b").alias(DST)),
            nodes=graph.nodes,
            keys={"directed": False},
        )
        comp = connected_components(fg, with_sizes=False)
        roots = comp.select(F.col("component").alias(ID)).distinct()

        try:
            settled = _root_forest(tree, roots, id_t, budget)
        except RuntimeError:
            tree.unpersist()
            raise

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
        kids = (
            settled.filter(F.col("parent").isNotNull())
            .groupBy("parent")
            .agg(F.count("*").alias("nkids"))
            .withColumnRenamed("parent", ID)
        )
        state = (
            settled.join(acc0, ID, "left")
            .join(kids, ID, "left")
            .select(
                ID,
                "parent",
                F.coalesce("acc", F.lit(0)).alias("acc"),
                F.coalesce("nkids", F.lit(0)).alias("pending"),
            )
            .localCheckpoint(eager=True)
        )
        tree.unpersist()

        # leaf peel: nodes with no unpeeled children finalize their subtree
        # XOR and push it to their parent; one aggregate + one join a round
        peeled: DataFrame | None = None
        for _ in range(budget + 1):
            ready, nxt = _peel_round(state)
            ready = ready.localCheckpoint(eager=True)
            if ready.limit(1).count() == 0:
                break
            done = ready.select(ID, "parent", F.col("acc").alias("sub_xor"))
            peeled = done if peeled is None else peeled.unionByName(done)
            peeled = peeled.localCheckpoint(eager=False)
            state = nxt.localCheckpoint(eager=True)
        else:
            raise RuntimeError(
                f"leaf peel did not drain within max_hops={budget} rounds — "
                "every tree peels in height rounds; engine bug"
            )

    if peeled is None:
        return empty  # star-free forest of isolated roots
    return (
        peeled.filter(F.col("sub_xor") == 0)
        .select(
            F.least(ID, "parent").alias(SRC), F.greatest(ID, "parent").alias(DST)
        )
    )


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
