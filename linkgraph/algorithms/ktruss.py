"""k-truss — triangle-support edge peeling (Cohen, "Trusses: cohesive
subgraphs for social network analysis", 2008; distributed rounds as in his
MapReduce formulation).

NOT present in the reference (no truss/cohesion code under ``mercury/``);
complements k-core: where the core peels NODES by degree, the truss peels
EDGES by triangle support — the standard next-strictness community
primitive.

Semantics match ``networkx.k_truss(G, k)``: the maximal subgraph whose
every edge participates in at least k−2 triangles WITHIN the subgraph.
Returned as the surviving canonical edge set (a < b); node materialization
is the caller's one-liner.

Distributed plan per peel round, over the shrinking canonical edge set:

1. orient edges low→high by (degree, id) — bounds wedge fan-out by
   O(sqrt(m)) on any graph (same hub-safety argument as triangle_count);
2. enumerate triangles once (wedge self-join + closing-edge semi-join),
   explode each into its 3 canonical edges, one algebraic groupBy counts
   per-edge support;
3. keep edges with support ≥ k−2 (left-semi); edges in no triangle have no
   support row and drop implicitly.

Rounds repeat until the edge count fixes — each round is one
triangle-enumeration pass (joins + algebraic aggregates, no windows, no
Python), and the round count is bounded by the peeling depth (small on
real graphs: removing an edge can only reduce support of edges in its
triangles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.session import static_plans

from .triangles import _canonical_undirected, _orient, _triples_of


def _edge_support(und: DataFrame) -> DataFrame:
    """DataFrame[a, b, support] — triangles per canonical edge (only edges
    in ≥1 triangle appear)."""
    e = _orient(und).persist()
    e.count()
    tri = _triples_of(e)
    sides = tri.select(
        F.array(
            F.struct(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")),
            F.struct(F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")),
            F.struct(F.col("y").alias("a"), F.col("z").alias("b")),  # y < z
        ).alias("es")
    ).select(F.explode("es").alias("e")).select("e.a", "e.b")
    supp = sides.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
    supp = supp.localCheckpoint(eager=True)
    e.unpersist()
    return supp


def k_truss(graph: LinkGraph, k: int, max_iter: int = 100) -> DataFrame:
    """DataFrame[src, dst] — canonical (src < dst) edges of the k-truss.

    ``k=2`` returns the full simple edge set (every edge is trivially in a
    2-truss); ``k<2`` raises."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    spark = graph.edges.sparkSession
    with static_plans(spark):
        und = _canonical_undirected(graph).localCheckpoint(eager=True)
        n_edges = und.count()
        if k == 2:
            return und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        for _ in range(max_iter):
            if n_edges == 0:
                break
            supp = _edge_support(und)
            keep = supp.filter(F.col("support") >= k - 2).select("a", "b")
            # build the (≤ triangle-edge-sized) keep set, stream the edge
            # table — both sides are stats-free checkpoints, so the planner
            # would otherwise sort-merge and sort both per round
            survivors = und.join(
                keep.hint("shuffle_hash"), ["a", "b"], "left_semi"
            ).localCheckpoint(eager=True)
            n_new = survivors.count()
            und = survivors
            if n_new == n_edges:
                break
            n_edges = n_new
        else:
            raise RuntimeError(
                f"k_truss did not stabilize within max_iter={max_iter} rounds"
            )
    return und.select(F.col("a").alias("src"), F.col("b").alias("dst"))


def truss_decomposition(
    graph: LinkGraph, max_k: int = 1_000, max_iter: int = 1_000
) -> DataFrame:
    """DataFrame[src, dst, trussness] — for every canonical simple edge the
    MAXIMUM k such that the edge survives in the k-truss (≥2 always; edges
    in no triangle are exactly 2). Ascending-k peeling: run the k-truss
    fixpoint at k=3, 4, …; edges dropped between the (k−1)- and k-fixpoints
    have trussness k−1, and the loop ends when the k-truss is empty.

    Each inner round reuses the SAME triangle-enumeration pass as
    :func:`k_truss` (joins + algebraic aggregates, no windows); total round
    count is Σ per-k peeling depths, bounded by the graph's truss number —
    small on real graphs. ``max_k`` is a runaway bound, not a truncation
    (raises if hit). networkx parity: trussness(e) = max{k :
    e ∈ nx.k_truss(G, k)}."""
    spark = graph.edges.sparkSession
    out_parts = []
    with static_plans(spark):
        und = _canonical_undirected(graph).localCheckpoint(eager=True)
        n_edges = und.count()
        k = 2
        while n_edges > 0:
            k += 1
            if k > max_k:
                raise RuntimeError(f"truss number exceeds max_k={max_k}")
            cur, n_cur = und, n_edges
            for _ in range(max_iter):
                supp = _edge_support(cur)
                keep = supp.filter(F.col("support") >= k - 2).select("a", "b")
                nxt = cur.join(
                    keep.hint("shuffle_hash"), ["a", "b"], "left_semi"
                ).localCheckpoint(eager=True)
                n_nxt = nxt.count()
                if n_nxt == n_cur:
                    break
                cur, n_cur = nxt, n_nxt
            else:
                raise RuntimeError(
                    f"truss fixpoint at k={k} did not stabilize within "
                    f"max_iter={max_iter} rounds"
                )
            dropped = und.join(cur, ["a", "b"], "left_anti")
            out_parts.append(
                dropped.select(
                    "a", "b", F.lit(k - 1).cast("int").alias("trussness")
                )
            )
            und, n_edges = cur, n_cur
    spark_out = None
    for p in out_parts:
        spark_out = p if spark_out is None else spark_out.unionByName(p)
    if spark_out is None:
        t = graph.nodes.schema["id"].dataType.simpleString()
        return spark.createDataFrame([], f"src {t}, dst {t}, trussness int")
    return spark_out.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "trussness"
    ).localCheckpoint(eager=True)
