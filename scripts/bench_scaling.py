"""N→4N scaling-efficiency evidence (BASELINE.md §3 protocol).

No multi-executor cluster exists in the sandbox, so the north rule's
"N to 4N executors, efficiency ≥ 0.8" criterion is evidenced by running the
IDENTICAL PageRank job on IDENTICAL input at local[8] vs local[32]
(4× cores), shuffle partitions scaled to cores, and reporting edges/sec per
superstep at both plus per-core scaling efficiency. Writes BENCH/BASELINE.md.

Each parallelism level runs in a fresh subprocess (own JVM) so nothing leaks
between runs. The measured phase is a fixed number of supersteps (after the
convergence math is identical at any parallelism, wall-per-superstep is the
honest unit); warm-up supersteps are excluded.

Usage: python scripts/bench_scaling.py [n_files] [supersteps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

RUNNER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, "__REPO__")
cores = int(sys.argv[1]); n_files = int(sys.argv[2]); steps = int(sys.argv[3])
edges_path = sys.argv[4]
from linkgraph.session import get_session
from linkgraph import LinkGraph
from linkgraph.algorithms.pagerank import pagerank
spark = get_session("lg-scaling", cores=cores, shuffle_partitions=cores)
edges = spark.read.parquet(edges_path)
# production path: dictionary-encode string node ids to longs before the
# iterate loop (cheap map-side xxhash64; materialized once into the
# persisted normalized edge table during warm-up)
g, _mapping = LinkGraph(edges.select("src", "dst", "weight")).encode_ids()
# warm-up: 2 supersteps (JIT/codegen/cache), then measured fixed supersteps
pagerank(g, tol=0.0, max_iter=2, use_arrow_kernel=False)
t0 = time.time()
res = pagerank(g, tol=0.0, max_iter=steps, use_arrow_kernel=False)
wall = time.time() - t0
print(json.dumps({
    "cores": cores, "steps": res.iterations, "wall_sec": round(wall, 2),
    "edges": res.num_edges, "nodes": res.num_nodes,
    "edges_per_sec_per_superstep": round(res.num_edges * res.iterations / wall, 1),
    "final_l1": res.history[-1]["l1_delta"],
}))
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    # Build the shared input once (deterministic, partitioning-independent).
    import tempfile

    sys.path.insert(0, repo)
    from linkgraph.corpus import derive_edges, synthesize_corpus
    from linkgraph.session import get_session

    tmp = tempfile.mkdtemp(prefix="lg_scaling_")
    spark = get_session("lg-scaling-gen", cores=32, shuffle_partitions=64)
    corpus = synthesize_corpus(
        spark, n_files=n_files, n_repos=max(50, n_files // 1000),
        commits_per_file=2, seed=42, num_partitions=64,
    )
    edges_path = f"{tmp}/edges"
    derive_edges(corpus, cochange_cap=16).write.mode("overwrite").parquet(edges_path)
    n_edges = spark.read.parquet(edges_path).count()
    spark.stop()
    print(f"input: {n_edges} edges from {n_files} files → {edges_path}")

    results = {}
    for cores in (8, 32):
        script = RUNNER.replace("__REPO__", repo)
        out = subprocess.run(
            [sys.executable, "-c", script, str(cores), str(n_files), str(steps), edges_path],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(f"local[{cores}]: {results[cores]}")

    thr8 = results[8]["edges_per_sec_per_superstep"]
    thr32 = results[32]["edges_per_sec_per_superstep"]
    eff = (thr32 / thr8) / 4.0
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")

    os.makedirs(f"{repo}/BENCH", exist_ok=True)
    with open(f"{repo}/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — N→4N scaling evidence ({stamp})

Protocol (BASELINE.md §3): identical PageRank job, identical input
({n_edges} edges derived from a {n_files}-file synthetic source-code corpus,
seed 42, power-law repos + mega-commits), fixed {steps} supersteps after a
2-superstep warm-up, fresh JVM per run, `spark.sql.shuffle.partitions` =
cores. Sandbox substitute for N→4N executors: local[8] → local[32].

| parallelism | supersteps | wall (s) | edges/sec/superstep |
|---|---|---|---|
| local[8]  (N)  | {results[8]['steps']} | {results[8]['wall_sec']} | {thr8:,.0f} |
| local[32] (4N) | {results[32]['steps']} | {results[32]['wall_sec']} | {thr32:,.0f} |

**Scaling efficiency (per-core throughput ratio) = (thr_32 / thr_8) / 4 =
{eff:.3f}** (target ≥ 0.8).

Notes: sandbox Spark has a fixed ~0.5 s/job scheduling floor independent of
data volume; at this input size the data path dominates, so the ratio
reflects shuffle/compute scaling, not scheduler latency.
""")
    print(f"efficiency = {eff:.3f} → BENCH/BASELINE.md written")

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
