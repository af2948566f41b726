#!/usr/bin/env python
"""Interleaved A/B: LPA top-1 as row_number window vs algebraic min(struct).

Round 4 replaced the per-superstep `row_number over (partitionBy(v))` top-1
with `groupBy(v).min(struct(-wsum, label))` (hub-safe: the partial aggregate
collapses a hub's candidate rows to one per upstream partition BEFORE the
exchange; the window sorts the whole degree-sized candidate set in one task).
This script measures what that costs / saves, interleaved A/B on a quiet
host (the only measurement protocol that survives this host's steal spikes —
see BENCH/BASELINE.md):

- leg "corpus": 5 supersteps on the 300k-file corpus graph (~2.3M edges,
  dictionary-encoded long ids, no extreme hubs) — the cost side.
- leg "hub": 5 supersteps on a star graph (one hub with HUB_DEGREE distinct
  neighbors + a ring background) — the safety side, where the window's
  single-task sort actually engages.

Writes BENCH/lpa_top1_ab.md. Run alone: `ps aux | grep java` must be empty.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = int(os.environ.get("LG_AB_REPS", "3"))
N_FILES = int(os.environ.get("LG_AB_FILES", "300000"))
HUB_DEGREE = int(os.environ.get("LG_AB_HUB_DEGREE", "4000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def window_best(und, labels):
    """The pre-round-4 top-1 (row_number window), kept here for A/B only."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from linkgraph.graph import ID

    nbr = (
        und.join(labels, und["u"] == labels[ID])
        .groupBy("v", "label")
        .agg(F.sum("w").alias("wsum"))
    )
    top1 = Window.partitionBy("v").orderBy(F.desc("wsum"), F.asc("label"))
    return (
        nbr.withColumn("_rn", F.row_number().over(top1))
        .filter(F.col("_rn") == 1)
        .select(F.col("v"), F.col("label").alias("_new"))
    )


def main():
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    import tempfile

    from pyspark.sql import functions as F

    import linkgraph.algorithms.label_propagation as lpa_mod
    from linkgraph import LinkGraph, label_propagation
    from linkgraph.corpus import derive_edges, ingest, synthesize_corpus
    from linkgraph.session import get_session

    spark = get_session("lpa-ab", cores=CPUS, shuffle_partitions=CPUS)
    tmp = tempfile.mkdtemp(prefix="lg_lpa_ab_")

    # ---- corpus leg input (same build as bench.py's headline) ----
    corpus = ingest(
        synthesize_corpus(
            spark, n_files=N_FILES, n_repos=max(50, N_FILES // 1000),
            commits_per_file=2, seed=42, num_partitions=CPUS * 2,
        )
    )
    corpus.write.mode("overwrite").parquet(f"{tmp}/corpus")
    corpus = spark.read.parquet(f"{tmp}/corpus")
    derive_edges(corpus, cochange_cap=16).write.mode("overwrite").parquet(
        f"{tmp}/edges"
    )
    edges = spark.read.parquet(f"{tmp}/edges")
    g_corpus, _ = LinkGraph(edges.select("src", "dst", "weight")).encode_ids()
    n_corpus_edges = g_corpus.edges.count()

    # ---- hub leg input: star (hub 0 → 1..HUB_DEGREE) + ring background ----
    hub = spark.range(1, HUB_DEGREE + 1).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    )
    ring = spark.range(1, HUB_DEGREE + 1).select(
        F.col("id").alias("src"),
        (F.col("id") % HUB_DEGREE + 1).alias("dst"),
    )
    hub.unionByName(ring).write.mode("overwrite").parquet(f"{tmp}/hub_edges")
    g_hub = LinkGraph(spark.read.parquet(f"{tmp}/hub_edges"))
    n_hub_edges = g_hub.edges.count()

    struct_best = lpa_mod._best_labels
    variants = {"struct": struct_best, "window": window_best}
    legs = {"corpus": g_corpus, "hub": g_hub}
    walls: dict[str, dict[str, list[float]]] = {
        leg: {v: [] for v in variants} for leg in legs
    }

    for rep in range(REPS):
        for vname, fn in variants.items():
            lpa_mod._best_labels = fn
            for leg, g in legs.items():
                t0 = time.time()
                label_propagation(g, max_iter=5).limit(1).collect()
                w = round(time.time() - t0, 2)
                walls[leg][vname].append(w)
                print(f"rep {rep} {leg:6s} {vname:6s} {w}s", flush=True)
    lpa_mod._best_labels = struct_best

    med = {
        leg: {v: statistics.median(ws) for v, ws in by.items()}
        for leg, by in walls.items()
    }
    lines = [
        "# LPA top-1: window vs algebraic min(struct) — interleaved A/B",
        "",
        f"5 supersteps each; legs alternate struct/window x{REPS} in one "
        f"session on local[{CPUS}]; per-variant MEDIANS. Inputs: corpus "
        f"graph {n_corpus_edges} edges (encoded long ids, no extreme hubs); "
        f"star-hub graph {n_hub_edges} edges (one degree-{HUB_DEGREE} hub "
        "+ ring).",
        "",
        "| leg | min(struct) median (s) | window median (s) | struct/window |",
        "|---|---|---|---|",
    ]
    for leg in legs:
        s, w = med[leg]["struct"], med[leg]["window"]
        lines.append(f"| {leg} | {s} | {w} | {s / w:.2f}x |")
    lines += [
        "",
        "All legs:",
        "",
        "| rep | leg | variant | wall (s) |",
        "|---|---|---|---|",
    ]
    for leg, by in walls.items():
        for v, ws in by.items():
            for i, w in enumerate(ws):
                lines.append(f"| {i} | {leg} | {v} | {w} |")
    lines += [
        "",
        "Reading: the struct aggregate's partial phase bounds hub fan-in "
        "(no task ever holds a degree-sized candidate set), which is the "
        "100-TB safety property; the corpus leg prices that safety on a "
        "hub-free graph. The engine ships the struct form (plan-audited: "
        "no Window in the LPA superstep).",
        "",
    ]
    out = os.path.join(REPO, "BENCH", "lpa_top1_ab.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
