"""Deterministic negative-edge sampling — training-data generation for
link-prediction / GNN pipelines (corrupt-tail sampling à la TransE/GraphSAGE
mini-batching), engine-replayable.

NOT in the reference (no sampling surface under ``mercury/``); added
because a 100-TB link-prediction pipeline needs negatives drawn WITHOUT a
driver-side RNG: every candidate here is a pure function of (node id,
trial index, seed), so retries, partitionings, AND external engines replay
the identical sample (the same md5-u60 discipline as the zipf/doulion
samplers).

Scheme (window-free, no dense id ranking needed):
1. every node gets a bucket b(v) = h60(v, seed) mod B with B = n; each
   bucket aggregates its members into ONE hash-sorted array (a bounded
   collect_list — mean size 1, max O(log n / log log n) w.h.p.; no
   row_number, no window);
2. each (source u, trial t) targets bucket h60(u, t, seed) mod B and
   picks member h60(u, t, "pick", seed) mod |bucket| (empty bucket →
   candidate dropped — occupancy is 1−1/e ≈ 63%, so ask for k/0.6
   trials to land ~k negatives; drops are deterministic too);
3. self-loops and existing edges are removed with one left-anti join
   against the canonical arc set.

Every node is reachable as a target; the residual bias is bucket-size
mass (a node in a size-s bucket is drawn ∝ 1/s around the uniform rate —
bounded by the max bucket size). The trade is documented because it buys
full determinism + replayability with zero windows and no dense-rank
shuffle.

Scale notes: one scan per side, one bounded collect_list aggregate, one
hash join on bucket, one anti-join on the arc set. No iteration, no
driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.generators import _h60
from linkgraph.graph import DST, ID, SRC, LinkGraph


def sample_negative_edges(
    graph: LinkGraph, k: int = 5, seed: int = 42
) -> DataFrame:
    """DataFrame[src, dst, trial] — up to ``k`` deterministic non-edges
    per node (module docstring for the draw law and its documented
    dropout). Directed semantics: a pair is a valid negative iff the arc
    src→dst does not exist (for undirected graphs the doubled edge set
    already blocks both directions)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = graph.edges.sparkSession
    n = graph.nodes.count()
    if n < 2:
        # typed empty derived from the node table so the id type survives
        return (
            graph.nodes.select(
                F.col(ID).alias("src"), F.col(ID).alias("dst")
            )
            .limit(0)
            .withColumn("trial", F.lit(0).cast("int"))
        )
    n_buckets = n

    seed_s = F.lit(str(seed))
    buckets = (
        graph.nodes.select(
            (_h60(ID, seed_s) % n_buckets).alias("_b"),
            F.struct(
                _h60(F.lit("rep"), ID, seed_s).alias("_rh"),
                F.col(ID).alias("_cand"),
            ).alias("_m"),
        )
        .groupBy("_b")
        .agg(F.sort_array(F.collect_list("_m")).alias("_arr"))
    )

    trials = spark.range(k).select(F.col("id").cast("int").alias("trial"))
    cand = (
        graph.nodes.select(F.col(ID).alias("src"))
        .crossJoin(trials)
        .select(
            "src",
            "trial",
            (_h60(F.col("src"), F.col("trial"), seed_s) % n_buckets).alias("_b"),
            _h60(F.col("src"), F.col("trial"), F.lit("pick"), seed_s).alias("_p"),
        )
        .join(buckets, "_b")
        .select(
            "src",
            F.element_at(
                "_arr", (F.col("_p") % F.size("_arr") + 1).cast("int")
            )["_cand"].alias("dst"),
            "trial",
        )
        .filter(F.col("src") != F.col("dst"))
    )
    arcs = graph.edges.select(SRC, DST).distinct()
    return cand.join(arcs, [SRC, DST], "left_anti")
