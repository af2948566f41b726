"""Skew micro-bench: one 10^6-degree hub, salted vs plain paths.

Two aggregation shapes, interleaved A/B in one process (host-steal protocol,
BENCH/BASELINE.md):

1. CSR grouped-adjacency build (collect_list — NON-algebraic: the hub's
   whole edge list concentrates in ONE reduce task without splitting)
   plain ``groupBy(src).collect_list`` vs ``split_hubs`` salted build.
2. contrib-style ``groupBy(key).sum`` (algebraic) plain vs ``two_phase_sum``
   — expected ~neutral-to-worse for the salted path on this engine because
   map-side partial aggregation already collapses hub fan-in; measured to
   document WHERE salting pays, not to assume it.

Usage: python scripts/bench_skew.py [hub_edges] [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from linkgraph.session import get_session  # noqa: E402
from linkgraph.skew import SALT, split_hubs, two_phase_sum  # noqa: E402


def build_edges(spark, hub_edges: int, bg_edges: int):
    """hub 'H' with hub_edges out-edges + bg_edges background edges spread
    over 10k sources. The skew ratio hub_edges / (total/partitions) decides
    whether the hub straggler dominates the job wall."""
    hub = spark.range(hub_edges).select(
        F.lit("H").alias("src"),
        F.concat(F.lit("d"), F.col("id")).alias("dst"),
        (F.pmod(F.col("id"), 97) + 1).cast("double").alias("weight"),
    )
    bg = spark.range(bg_edges).select(
        F.concat(F.lit("s"), F.pmod(F.col("id"), 10_000)).alias("src"),
        F.concat(F.lit("d"), F.pmod(F.col("id") * 7, 500_000)).alias("dst"),
        (F.pmod(F.col("id"), 31) + 1).cast("double").alias("weight"),
    )
    return hub.unionByName(bg).repartition(32).localCheckpoint(eager=True)


def timed(label, fn, rounds):
    times = []
    for _ in range(rounds):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    best = min(times)
    print(f"  {label:34s} {best:7.2f}s  (runs: {', '.join(f'{t:.2f}' for t in times)})")
    return best


def main():
    hub_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bg_edges = int(sys.argv[3]) if len(sys.argv) > 3 else hub_edges
    spark = get_session(app_name="bench-skew", cores=8, shuffle_partitions=32)
    edges = build_edges(spark, hub_edges, bg_edges)
    n = edges.count()
    print(f"edges: {n:,} (hub degree {hub_edges:,}, background {bg_edges:,})")

    # -- shape 1: CSR adjacency build (collect_list, non-algebraic) --------
    def csr_plain():
        adj = edges.groupBy("src").agg(
            F.sort_array(F.collect_list(F.struct("dst", "weight"))).alias("adj")
        )
        adj.agg(F.sum(F.size("adj"))).collect()

    def csr_split():
        flagged = split_hubs(edges, "src", degree_threshold=100_000, buckets=32)
        adj = flagged.groupBy("src", SALT).agg(
            F.sort_array(F.collect_list(F.struct("dst", "weight"))).alias("adj")
        )
        adj.agg(F.sum(F.size("adj"))).collect()

    # probe amortized (the loop case: node2vec/pagerank pay the degree scan
    # once per run, then reuse the flagged table every superstep)
    flagged_pre = split_hubs(
        edges, "src", degree_threshold=100_000, buckets=32
    ).localCheckpoint(eager=True)

    def csr_split_amortized():
        adj = flagged_pre.groupBy("src", SALT).agg(
            F.sort_array(F.collect_list(F.struct("dst", "weight"))).alias("adj")
        )
        adj.agg(F.sum(F.size("adj"))).collect()

    # -- shape 2: contrib-style sum (algebraic) ----------------------------
    def sum_plain():
        edges.groupBy("dst").agg(F.sum("weight").alias("w")).agg(
            F.sum("w")
        ).collect()

    def sum_salted():
        two_phase_sum(edges, "dst", "weight", "w", buckets=16).agg(
            F.sum("w")
        ).collect()

    print("shape 1: CSR grouped adjacency (collect_list)")
    a = timed("plain groupBy(src)", csr_plain, rounds)
    b = timed("split_hubs + groupBy(src, salt)", csr_split, rounds)
    b2 = timed("salted, probe amortized", csr_split_amortized, rounds)
    print(f"  -> salted speedup {a / b:.2f}x (cold probe), {a / b2:.2f}x (amortized)")
    print("shape 2: algebraic sum")
    c = timed("plain groupBy(dst).sum", sum_plain, rounds)
    d = timed("two_phase_sum(dst)", sum_salted, rounds)
    print(f"  -> salted speedup {c / d:.2f}x")


if __name__ == "__main__":
    main()
