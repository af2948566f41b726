"""Independent-cascade (IC) diffusion simulation with deterministic
md5 coins — spread estimation + per-candidate influence scoring.

NOT in the reference (mercury's diffusion surface stops at spreading
activation, which is a deterministic fractional flow — ml/spark_spreader.py);
IC (Kempe-Kleinberg-Tardos, KDD'03) is the standard probabilistic model
behind influence maximization, and its live-edge formulation is what a
training-data team uses to simulate label/contamination propagation over
a link graph.

Determinism (the engine-wide md5-u60 discipline, same as the zipf /
negative-sampling / rewire draws): edge (u,v) is LIVE in trial t iff
h60("ic", seed, t, u, v) < ⌊p·2^60⌋ — a pure column expression, no RNG
state, so the sample is identical across runs, retries, partitionings,
and engines (the DuckDB oracle replays the coins digit-for-digit). By
the KKT live-edge lemma, the activated set of seed set S in trial t IS
the set reachable from S in that trial's live subgraph, so the
simulation is a multi-trial BFS, not a per-round re-flip — one coin per
(edge, trial) exactly as the model prescribes. Undirected graphs share
ONE coin per undirected edge (canonicalized least/greatest endpoint
order) and both arcs go live together.

Spark-first shape: live edges for ALL trials materialize as one
projection + filter over edges × sequence(1..T) (an explode, no
shuffle), pre-partitioned by (trial, src) and pinned
(:func:`linkgraph.session.pin_partitioned`); each BFS round is ONE join
+ ONE anti-join + distinct on the frontier — only the frontier-sized
side shuffles per round, the same rank-side-only discipline as pagerank.
State is O(activated × trials) rows. At 100 TB-scale trial counts, run
trial batches; the coins make batches composable (trial t's sample never
depends on the batch split).

``ic_influence`` scores every candidate's SINGLE-SEED expected spread in
one shared BFS (state keyed by (candidate, trial, node)) — the
embarrassingly-parallel measurement. ``ic_greedy_seeds`` builds the
actual seed SET by greedy marginal-coverage maximization over the same
reach table (the KKT (1−1/e) guarantee); the argmax chain is inherently
sequential in k, so that final step is driver-local over the collected
reach rows behind a size probe — bound it with the candidate pool and
trial count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.generators import _B60, _h60
from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned


def _live_coin(directed: bool, p: float, seed: int) -> F.Column:
    """Boolean column: is the (src, dst) arc live? Undirected edges share
    one coin via canonical endpoint order."""
    if directed:
        a, b = F.col(SRC), F.col(DST)
    else:
        a, b = F.least(SRC, DST), F.greatest(SRC, DST)
    return _h60(F.lit("ic"), F.lit(str(seed)), F.col("trial"), a, b) < F.lit(
        int(p * _B60)
    )


def ic_live_edges(
    graph: LinkGraph, p: float, n_trials: int, seed: int = 42
) -> DataFrame:
    """DataFrame[trial, src, dst] — the live-edge subgraphs of all
    ``n_trials`` trials (trial ∈ 1..n_trials), one md5 coin per
    (edge, trial); module docstring for the draw law."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    if n_trials < 1:
        raise ValueError(f"n_trials must be >= 1, got {n_trials}")
    arcs = graph.edges.select(SRC, DST).distinct()
    return (
        arcs.select(
            F.explode(F.sequence(F.lit(1), F.lit(n_trials))).alias("trial"),
            SRC,
            DST,
        )
        .filter(_live_coin(graph.is_directed, p, seed))
        .select("trial", SRC, DST)
    )


def ic_spread(
    graph: LinkGraph,
    seeds,
    p: float = 0.1,
    n_trials: int = 10,
    max_rounds: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """DataFrame[trial, id, round] — every node activated in each trial,
    with ``round`` its activation round (0 = seed; BFS distance from the
    seed set in that trial's live subgraph). ``max_rounds`` caps the
    propagation depth (None = run to frontier exhaustion)."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    spark = graph.edges.sparkSession
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    live = pin_partitioned(
        ic_live_edges(graph, p, n_trials, seed).repartition(
            shuffle, "trial", SRC
        )
    )
    seeds_df = spark.createDataFrame([(s,) for s in seeds], [ID]).distinct()
    try:
        acc = (
            seeds_df.crossJoin(
                spark.range(1, n_trials + 1).select(
                    F.col("id").cast("int").alias("trial")
                )
            )
            .select("trial", ID, F.lit(0).alias("round"))
            .localCheckpoint(eager=True)
        )
        frontier = acc
        r = 0
        while max_rounds is None or r < max_rounds:
            r += 1
            nxt = (
                live.join(
                    frontier.select("trial", F.col(ID).alias(SRC)),
                    ["trial", SRC],
                )
                .select("trial", F.col(DST).alias(ID))
                .distinct()
                .join(acc.select("trial", ID), ["trial", ID], "left_anti")
                .select("trial", ID, F.lit(r).alias("round"))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            acc = acc.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
    finally:
        live.unpersist()
    return acc


def _candidate_reach(
    graph: LinkGraph,
    candidates,
    p: float,
    n_trials: int,
    max_rounds: int | None,
    seed: int,
) -> DataFrame:
    """DataFrame[_cand, trial, id] — every node each candidate reaches in
    each trial's live subgraph (one shared multi-source BFS; candidates
    see the SAME live edges — common random numbers)."""
    if not candidates:
        raise ValueError("candidates must be non-empty")
    spark = graph.edges.sparkSession
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    live = pin_partitioned(
        ic_live_edges(graph, p, n_trials, seed).repartition(
            shuffle, "trial", SRC
        )
    )
    cand_df = spark.createDataFrame(
        [(c,) for c in candidates], ["_cand"]
    ).distinct()
    try:
        acc = (
            cand_df.crossJoin(
                spark.range(1, n_trials + 1).select(
                    F.col("id").cast("int").alias("trial")
                )
            )
            .select("_cand", "trial", F.col("_cand").alias(ID))
            .localCheckpoint(eager=True)
        )
        frontier = acc
        r = 0
        while max_rounds is None or r < max_rounds:
            r += 1
            nxt = (
                live.join(
                    frontier.select("_cand", "trial", F.col(ID).alias(SRC)),
                    ["trial", SRC],
                )
                .select("_cand", "trial", F.col(DST).alias(ID))
                .distinct()
                .join(
                    acc.select("_cand", "trial", ID),
                    ["_cand", "trial", ID],
                    "left_anti",
                )
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            acc = acc.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
    finally:
        live.unpersist()
    return acc.select("_cand", "trial", ID)


def ic_influence(
    graph: LinkGraph,
    candidates,
    p: float = 0.1,
    n_trials: int = 10,
    max_rounds: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """DataFrame[id, spread_millionths] — each candidate's expected
    single-seed IC spread (mean activated count over trials, incl. the
    seed itself), as round(1e6·mean) for engine-portable hashing. This is
    per-candidate scoring, not greedy submodular selection — see
    :func:`ic_greedy_seeds` for the seed-SET builder."""
    reach = _candidate_reach(graph, candidates, p, n_trials, max_rounds, seed)
    return (
        reach.groupBy("_cand")
        .agg(F.count(F.lit(1)).alias("_total"))
        .select(
            F.col("_cand").alias(ID),
            F.round(F.col("_total") * 1_000_000 / F.lit(n_trials))
            .cast("long")
            .alias("spread_millionths"),
        )
    )


def ic_greedy_seeds(
    graph: LinkGraph,
    candidates,
    k: int,
    p: float = 0.1,
    n_trials: int = 10,
    max_rounds: int | None = None,
    seed: int = 42,
    max_reach_rows: int = 2_000_000,
) -> DataFrame:
    """DataFrame[rank, id, marginal_millionths, total_millionths] — a
    k-seed set built by greedy marginal-coverage maximization over the
    per-trial live-edge reach sets (the Kempe-Kleinberg-Tardos (1−1/e)
    approximation). Ties on marginal gain take the smallest id; marginal
    and cumulative expected spreads are reported in millionths.

    The distributed part is the shared multi-trial BFS
    (:func:`_candidate_reach`, state (candidate, trial, node)); the
    greedy argmax itself is inherently sequential in k, so it runs
    driver-local over the COLLECTED reach rows — size-probed against
    ``max_reach_rows`` BEFORE any collect, the same guard discipline as
    betweenness/bridges. Bound it with the candidate pool (e.g. VoteRank
    or top-degree pre-selection) and n_trials."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cand_list = sorted(set(candidates))
    reach = _candidate_reach(
        graph, cand_list, p, n_trials, max_rounds, seed
    ).persist()
    try:
        if reach.limit(max_reach_rows + 1).count() > max_reach_rows:
            raise ValueError(
                f"reach table exceeds max_reach_rows={max_reach_rows}; "
                "shrink the candidate pool or n_trials, or raise the guard"
            )
        sets: dict = {c: set() for c in cand_list}
        for row in reach.collect():
            sets[row["_cand"]].add((row["trial"], row[ID]))
    finally:
        reach.unpersist()

    spark = graph.edges.sparkSession
    covered: set = set()
    picked = []
    total = 0
    for rank in range(1, min(k, len(cand_list)) + 1):
        best, best_gain = None, -1
        for c in cand_list:
            if c in (pid for pid, _, _, _ in picked):
                continue
            gain = len(sets[c] - covered)
            if gain > best_gain or (gain == best_gain and (best is None or c < best)):
                best, best_gain = c, gain
        marginal = round(1e6 * best_gain / n_trials)
        covered |= sets[best]
        total = round(1e6 * len(covered) / n_trials)
        picked.append((best, rank, marginal, total))
    id_type = dict(graph.nodes.dtypes)[ID]
    return spark.createDataFrame(
        [(r, c, m, t) for c, r, m, t in picked],
        f"rank int, {ID} {id_type}, marginal_millionths bigint, "
        "total_millionths bigint",
    )
