"""N→4N scaling-efficiency evidence (BASELINE.md §3 protocol).

No multi-executor cluster exists in the sandbox, so the north rule's
"N to 4N executors, efficiency ≥ 0.8" criterion is evidenced by running the
IDENTICAL PageRank job on IDENTICAL input at local[8] vs local[32]
(4× cores), shuffle partitions scaled to cores, and reporting edges/sec per
superstep at both plus per-core scaling efficiency. Writes
BENCH/scaling_latest.md (promote to BENCH/BASELINE.md by hand after
checking the legs are steal-free).

Each parallelism level runs in a fresh subprocess (own JVM) so nothing leaks
between runs. The measured phase is a fixed number of supersteps (after the
convergence math is identical at any parallelism, wall-per-superstep is the
honest unit); warm-up supersteps are excluded.

The N and 4N core counts are chosen against MEASURED host capacity: the
sandbox advertises 32 vCPUs but a raw multiprocessing calibration shows
parallel throughput saturating around 8 workers (32 workers run SLOWER than
8), i.e. the box physically delivers ~8 cores. Comparing local[8] vs
local[32] would therefore measure virtualization artifacts, not the engine.
Default pair is local[2] → local[8] (both within real capacity); override
with LG_SCALE_CORES="8,32". The calibration result is recorded in the
report.

Usage: python scripts/bench_scaling.py [n_files] [supersteps]
"""

from __future__ import annotations

import json
import multiprocessing
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

RUNNER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, "__REPO__")
cores = int(sys.argv[1]); n_files = int(sys.argv[2]); steps = int(sys.argv[3])
edges_path = sys.argv[4]
from linkgraph.session import get_session
from linkgraph import LinkGraph, connected_components, label_propagation
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
m = res.num_edges
out = {
    "cores": cores, "steps": res.iterations, "wall_sec": round(wall, 2),
    "edges": m, "nodes": res.num_nodes,
    "edges_per_sec_per_superstep": round(m * res.iterations / wall, 1),
    "final_l1": res.history[-1]["l1_delta"],
}
# cc: converged two-star — round count is data-dependent but parallelism-
# independent (identical input => identical rounds at N and 4N), so the
# wall ratio IS the throughput ratio
t0 = time.time()
connected_components(g, method="two_star", with_sizes=False,
                     strategy="distributed").agg({"component": "max"}).collect()
out["cc_wall_sec"] = round(time.time() - t0, 2)
out["cc_edges_per_sec"] = round(m / out["cc_wall_sec"], 1)
# lpa: fixed 5 synchronous supersteps
t0 = time.time()
label_propagation(g, max_iter=5).agg({"label": "max"}).collect()
out["lpa_wall_sec"] = round(time.time() - t0, 2)
out["lpa_edges_per_sec_per_superstep"] = round(m * 5 / out["lpa_wall_sec"], 1)
print(json.dumps(out))
"""


def _burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def calibrate_host(work=3_000_000, tasks=32):
    """Measured parallel speedup at 1/8/32 workers — documents how many real
    cores the sandbox delivers (vCPU count lies under virtualization)."""
    out = {}
    for procs in (1, 8, 32):
        t0 = time.time()
        with multiprocessing.Pool(procs) as p:
            p.map(_burn, [work] * tasks)
        out[procs] = round(time.time() - t0, 2)
    return {
        "wall": out,
        "speedup_8": round(out[1] / out[8], 2),
        "speedup_32": round(out[1] / out[32], 2),
    }


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    core_pair = tuple(
        int(x) for x in os.environ.get("LG_SCALE_CORES", "2,8").split(",")
    )
    assert core_pair[1] == 4 * core_pair[0], "pair must be N and 4N"
    calib = calibrate_host()
    print("host calibration:", calib)

    # Build the shared input once (deterministic, partitioning-independent).
    # In a SUBPROCESS: pyspark's gateway JVM only dies when its owning
    # python process exits (it monitors the launcher's pipe), so generating
    # in-process would leave a JVM burning a full core for the entire leg
    # sequence after spark.stop() — measured 100% CPU, exactly the orphan
    # contamination the leg protocol exists to avoid.
    import tempfile

    # LG_SCALE_EDGES: reuse an already-generated edge parquet (the
    # generation is deterministic in n_files/seed, so a relaunch after a
    # leg failure — OOM, steal storm — need not pay the ~13-min synthesis
    # again; the caller owns the path/file-count match)
    pre = os.environ.get("LG_SCALE_EDGES")
    if pre:
        n_edges = None
        edges_path = pre
        tmp = None
    else:
        tmp = tempfile.mkdtemp(prefix="lg_scaling_")
        edges_path = f"{tmp}/edges"
    gen_script = f"""
import sys
sys.path.insert(0, {repo!r})
from linkgraph.corpus import derive_edges, synthesize_corpus
from linkgraph.session import get_session
spark = get_session("lg-scaling-gen", cores=32, shuffle_partitions=64)
corpus = synthesize_corpus(
    spark, n_files={n_files}, n_repos=max(50, {n_files} // 1000),
    commits_per_file=2, seed=42, num_partitions=64,
).persist()  # 3 relation branches in derive_edges scan the corpus
derive_edges(corpus, cochange_cap=16).write.mode("overwrite").parquet({edges_path!r})
corpus.unpersist()
print("N_EDGES=" + str(spark.read.parquet({edges_path!r}).count()))
"""
    if not pre:
        gen = subprocess.run(
            [sys.executable, "-c", gen_script], capture_output=True, text=True,
            timeout=3600,
        )
        marks = [l for l in gen.stdout.splitlines() if l.startswith("N_EDGES=")]
        if not marks:
            print("input generation failed; stderr tail:")
            print("\n".join(gen.stderr.strip().splitlines()[-30:]))
            sys.exit(1)
        n_edges = int(marks[-1].split("=")[1])
    print(f"input: {n_edges or 'pre-generated'} edges from {n_files} files "
          f"→ {edges_path}")

    # Shared-tenancy host steal swings single legs by 2-4x (one measured
    # local[32] leg ran 4x slower than the identical job an hour earlier).
    # Protocol: alternate N / 4N legs LG_SCALE_REPS times and consolidate
    # per-metric MEDIANS per parallelism — minima are not robust here
    # because hypervisor burst credits occasionally make a leg anomalously
    # FAST, the one direction a "steal only slows runs" minimum can't handle.
    reps = int(os.environ.get("LG_SCALE_REPS", "2"))
    results = {}
    all_runs = {c: [] for c in core_pair}
    for rep in range(reps):
        for cores in core_pair:
            script = RUNNER.replace("__REPO__", repo)
            out = subprocess.run(
                [sys.executable, "-c", script, str(cores), str(n_files),
                 str(steps), edges_path],
                capture_output=True, text=True, timeout=3600,
            )
            json_lines = [
                l for l in out.stdout.strip().splitlines() if l.startswith("{")
            ]
            if not json_lines:
                print(f"local[{cores}] rep {rep} produced no JSON; stderr tail:")
                print("\n".join(out.stderr.strip().splitlines()[-30:]))
                continue
            run = json.loads(json_lines[-1])
            all_runs[cores].append(run)
            print(f"local[{cores}] rep {rep}: {run}")
    import statistics

    for cores in core_pair:
        if not all_runs[cores]:
            print(f"no successful runs at local[{cores}]")
            sys.exit(1)
        # Per-metric MEDIAN across legs: minima are not robust on this host
        # — hypervisor burst credits occasionally make a leg anomalously
        # FAST (a measured local[8] leg ran 5x faster than its siblings),
        # the one direction a "steal only slows runs" minimum cannot
        # handle. Medians damp both tails. Derived throughputs are
        # recomputed from the consolidated walls so the dict stays
        # internally consistent.
        cons = dict(all_runs[cores][0])
        for k in ("wall_sec", "cc_wall_sec", "lpa_wall_sec"):
            cons[k] = round(statistics.median(r[k] for r in all_runs[cores]), 2)
        cons["edges_per_sec_per_superstep"] = round(
            cons["edges"] * cons["steps"] / cons["wall_sec"], 1
        )
        cons["cc_edges_per_sec"] = round(cons["edges"] / cons["cc_wall_sec"], 1)
        cons["lpa_edges_per_sec_per_superstep"] = round(
            cons["edges"] * 5 / cons["lpa_wall_sec"], 1
        )
        results[cores] = cons

    n_c, n4_c = core_pair
    thr_n = results[n_c]["edges_per_sec_per_superstep"]
    thr_4n = results[n4_c]["edges_per_sec_per_superstep"]
    eff = (thr_4n / thr_n) / 4.0
    eff_cc = (
        results[n_c]["cc_wall_sec"] / results[n4_c]["cc_wall_sec"]
    ) / 4.0
    eff_lpa = (
        results[n_c]["lpa_wall_sec"] / results[n4_c]["lpa_wall_sec"]
    ) / 4.0
    # capacity-normalized: divide the Spark throughput ratio by the host's
    # measured raw-CPU capacity ratio between the same worker counts
    cap_n = calib["speedup_8"] if n_c == 8 else (calib["speedup_32"] if n_c == 32 else n_c)
    cap_4n = calib["speedup_8"] if n4_c == 8 else (calib["speedup_32"] if n4_c == 32 else n4_c)
    cap_ratio = cap_4n / cap_n
    eff_norm = (thr_4n / thr_n) / cap_ratio
    if n_edges is None:  # pre-generated input: take the count from a leg
        n_edges = all_runs[core_pair[0]][0]["edges"]
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")

    os.makedirs(f"{repo}/BENCH", exist_ok=True)
    # Write to scaling_latest.md, NOT BENCH/BASELINE.md: BASELINE.md is the
    # curated record (it carries cross-round context, the contamination
    # disclosures, and the standing quiet-window measurement). Promote a run
    # into it by hand after judging the host conditions — an automated
    # overwrite once replaced it with a burst-leg artifact.
    with open(f"{repo}/BENCH/scaling_latest.md", "w") as f:
        f.write(f"""# BENCH/scaling_latest — N→4N scaling run ({stamp})

(Generated by scripts/bench_scaling.py. The curated standing record is
BENCH/BASELINE.md — promote these numbers there only after checking the
per-leg variance table below for steal/burst contamination.)

Protocol (BASELINE.md §3): identical PageRank job, identical input
({n_edges} edges derived from a {n_files}-file synthetic source-code corpus,
seed 42, power-law repos + mega-commits), fixed {steps} supersteps after a
2-superstep warm-up, fresh JVM per run, `spark.sql.shuffle.partitions` =
cores. Sandbox substitute for N→4N executors: local[{n_c}] → local[{n4_c}].

## Host capacity calibration

The sandbox advertises 32 vCPUs; a raw multiprocessing calibration
(pure-Python CPU work, no Spark) at run time measures parallel speedup vs 1
worker of **{calib['speedup_8']}× at 8 workers and {calib['speedup_32']}× at
32 workers** (walls: {calib['wall']}) — roughly
{max(calib['speedup_8'], calib['speedup_32']):.0f} effective cores, and the
measured capacity FLUCTUATES between runs (shared tenancy; one calibration
showed 32 workers slower than 8). Scaling numbers on this host carry that
noise floor; the engine-side properties below are what transfer to a real
cluster.

| parallelism | supersteps | wall (s) | edges/sec/superstep |
|---|---|---|---|
| local[{n_c}]  (N)  | {results[n_c]['steps']} | {results[n_c]['wall_sec']} | {thr_n:,.0f} |
| local[{n4_c}] (4N) | {results[n4_c]['steps']} | {results[n4_c]['wall_sec']} | {thr_4n:,.0f} |

**Scaling efficiency (nominal, vs 4× vCPUs) = (thr_{n4_c} / thr_{n_c}) / 4 =
{eff:.3f}** (target ≥ 0.8).

## Per-algorithm scaling (same input, same runs)

| algorithm | local[{n_c}] wall (s) | local[{n4_c}] wall (s) | nominal efficiency |
|---|---|---|---|
| PageRank ({steps} supersteps) | {results[n_c]['wall_sec']} | {results[n4_c]['wall_sec']} | {eff:.3f} |
| connected components (two-star, converged) | {results[n_c]['cc_wall_sec']} | {results[n4_c]['cc_wall_sec']} | {eff_cc:.3f} |
| label propagation (5 supersteps) | {results[n_c]['lpa_wall_sec']} | {results[n4_c]['lpa_wall_sec']} | {eff_lpa:.3f} |

(cc round count is data-dependent but parallelism-independent — identical
input runs identical rounds at N and 4N, so wall ratios are throughput
ratios.)

## All legs (steal disclosure)

Legs alternate N / 4N x{reps}; the tables above use per-metric MEDIANS
across legs (steal slows runs down, but hypervisor burst credits also make
occasional legs anomalously fast — medians damp both tails). Every leg
measured:

| parallelism | rep | pagerank wall (s) | cc wall (s) | lpa wall (s) |
|---|---|---|---|---|
""" + "\n".join(
            f"| local[{c}] | {i} | {r['wall_sec']} | {r['cc_wall_sec']} | {r['lpa_wall_sec']} |"
            for c in core_pair for i, r in enumerate(all_runs[c])
        ) + f"""

**Capacity-normalized efficiency = Spark throughput ratio
({thr_4n / thr_n:.2f}×) ÷ host raw-CPU capacity ratio ({cap_ratio:.2f}×) =
{eff_norm:.3f}** — the engine extracts that fraction of the parallel
capacity the host physically delivered between the two worker counts.

Engine-side scaling facts (verified via explain, see README "Scale design"):
one data exchange per superstep (the contribution groupBy); the cached edge
table is scanned, never re-shuffled or re-sorted (shuffled-hash build on the
node-sized rank side); the convergence stats are a pure scan of the
superstep's own output (no join), so they add no exchange. (Correction,
r4: localCheckpoint does NOT preserve partitioning for Catalyst — it
degrades to an unknown-partitioning RDD scan; pagerank's edge table is
persist()-ed, which is what actually keeps its repartition(src) visible.
The same fix was rolled out to every other superstep loop this round —
see session.pin_partitioned and the LPA interleaved A/B.) Shuffle/compute per superstep is
proportional to edges and nodes respectively — the properties that carry
scaling to a real multi-executor cluster.

Prior measurements on this host (contamination-free, 8g heap unless noted):
7.8M edges local[8]→local[32] eff 0.816; 23M edges local[8]→local[32] eff
0.497 (8g) / 0.127 (32g heap, local[32] slower than local[8]) — consistent
with the ~8-real-core calibration above, not with an engine bottleneck.
""")
    print(f"efficiency = {eff:.3f} → BENCH/scaling_latest.md written")

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
