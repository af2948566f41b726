"""Deterministic distributed graph generators — R-MAT and uniform G(n, m).

Beyond the reference (no synthetic-graph sources in ``mercury/``): a
link-graph engine needs benchmark/test graphs it can synthesize AT SCALE —
R-MAT (Chakrabarti, Zhan, Faloutsos, SDM'04; the Graph500 generator) gives
power-law, community-structured edge lists; G(n, m) gives the uniform
control.

Scale shape: both generators are pure column expressions over
``spark.range(m)`` — embarrassingly parallel, zero shuffle, no RNG state.
Randomness is md5-derived (the same engine-portable primitive as
:mod:`linkgraph.pipeline.sampling`): edge i's bits come from
``md5(seed:i:level:tag)``, so the SAME edge list materializes on every run,
every partitioning, and every engine (the DuckDB oracles replay the
arithmetic digit-for-digit). Quadrant choices compare 60-bit integer
hashes against integer thresholds — no float anywhere.

Like every sampling-with-replacement generator (including Graph500's),
output is a multigraph with possible self-loops; ``.distinct()`` or
``LinkGraph`` canonicalization downstream dedups when needed.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_B60 = 1 << 60


def _h60(*parts) -> F.Column:
    """60-bit uniform integer from md5 of ':'-joined parts (first 15 hex
    digits big-endian — the engine-portable slice)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts)), 1, 15), 16, 10
    ).cast("long")


def rmat_graph(
    spark: SparkSession,
    scale: int,
    num_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame[i, src, dst] — R-MAT over n = 2^scale nodes: each edge
    descends ``scale`` quadrant choices; at level l the 60-bit hash of
    (seed, i, l) picks the quadrant by integer thresholds ⌊a·2^60⌋ /
    ⌊(a+b)·2^60⌋ / ⌊(a+b+c)·2^60⌋ (d = 1−a−b−c implicit). Defaults are the
    Graph500 parameters."""
    if scale < 1 or scale > 62:
        raise ValueError(f"scale must be in [1, 62], got {scale}")
    # float-dust tolerance: a=0.3,b=0.3,c=0.4 gives 1-a-b-c = -5.6e-17,
    # which must not reject a mathematically valid parameterization
    if min(a, b, c) < 0 or a + b + c > 1.0 + 1e-12:
        raise ValueError(
            f"need a,b,c >= 0 and a+b+c <= 1 (got a+b+c={a + b + c!r})"
        )
    ta, tb, tc = (int(x * _B60) for x in (a, a + b, a + b + c))
    df = spark.range(0, num_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    lv = F.sequence(F.lit(0), F.lit(scale - 1))
    hashes = F.transform(lv, lambda l: _h60(F.lit(str(seed)), F.col("id"), l))
    quad = F.transform(
        hashes,
        lambda h: (
            F.when(h < ta, F.lit(0))
            .when(h < tb, F.lit(1))
            .when(h < tc, F.lit(2))
            .otherwise(F.lit(3))
        ),
    )
    fold = lambda bit: F.aggregate(  # noqa: E731
        F.col("_q"), F.lit(0).cast("long"), lambda acc, q: acc * 2 + bit(q)
    )
    return (
        df.withColumn("_q", quad)
        .select(
            F.col("id").alias("i"),
            fold(lambda q: (q >= 2).cast("long")).alias("src"),
            fold(lambda q: (q % 2).cast("long")).alias("dst"),
        )
    )


def gnm_graph(
    spark: SparkSession,
    n: int,
    num_edges: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame[i, src, dst] — uniform random edges over n nodes (sampling
    with replacement): endpoint = 60-bit hash of (seed, i, tag) mod n."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    df = spark.range(0, num_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return df.select(
        F.col("id").alias("i"),
        F.pmod(_h60(F.lit(str(seed)), F.col("id"), F.lit("s")), F.lit(n)).alias("src"),
        F.pmod(_h60(F.lit(str(seed)), F.col("id"), F.lit("d")), F.lit(n)).alias("dst"),
    )


def zipf_graph(
    spark: SparkSession,
    n: int,
    m: int,
    s: float = 1.0,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame[i, src, dst] — scale-free random multigraph: each of the
    ``m`` edges draws both endpoints independently from a Zipf-like rank
    distribution P(node = v) ≈ (v+1)^(−s) over ranks 0..n−1, giving heavy
    hub nodes at low ranks (the edge-skeleton Chung–Lu construction with
    analytic weights — no weight table, no CDF broadcast).

    Sampling is the continuous bounded-Pareto inverse CDF, taken as the
    DEFINITION of the distribution (exactly proportional in the continuum
    limit, off by O(s/v) per rank at the head — documented, deliberate:
    the closed form keeps the generator a pure projection over
    ``spark.range(m)`` with zero shuffle and zero driver state at ANY n):

        s ≠ 1:  node = ⌊(u·((n+1)^(1−s) − 1) + 1)^(1/(1−s))⌋ − 1
        s = 1:  node = ⌊exp(u·ln(n+1))⌋ − 1

    with u = (h60+0.5)/2^60 from ``md5(seed:i:tag)`` (tag "s"/"d") — the
    same engine-portable primitive as :func:`rmat_graph`, so the oracle
    replays every edge. The only cross-engine hazard is a pow/ln result
    landing within 1 ulp of an integer boundary (probability ~2⁻⁴⁸ per
    edge); s=0 degenerates to uniform endpoints (a G(n, m) control).
    Multigraph with self-loops, as all the generators here.

    At s=1 the expected rank-degree profile is ∝ 1/(v+1), whose degree
    distribution has CCDF exponent ≈ 1+1/s = 2 — pair with
    :func:`linkgraph.algorithms.assortativity.powerlaw_alpha` to close
    the loop."""
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    if m < 0:
        raise ValueError(f"need m >= 0, got {m}")
    if s < 0:
        raise ValueError(f"s must be >= 0, got {s}")
    df = spark.range(
        0, m, 1, num_partitions or spark.sparkContext.defaultParallelism
    )

    def node(tag: str) -> F.Column:
        h = _h60(F.lit(str(seed)), F.col("id"), F.lit(tag)).cast("double")
        u = (h + F.lit(0.5)) / F.lit(float(_B60))
        if s == 1.0:
            x = F.exp(u * F.lit(float(math.log(n + 1.0))))
        else:
            top = float((n + 1.0) ** (1.0 - s))
            x = F.pow(
                u * F.lit(top - 1.0) + F.lit(1.0), F.lit(1.0 / (1.0 - s))
            )
        # clamp guards the u→1 edge where floor(x) could reach n+… in float
        return F.least(F.floor(x).cast("long") - 1, F.lit(n - 1))

    return df.select(
        F.col("id").alias("i"), node("s").alias("src"), node("d").alias("dst")
    )


def watts_strogatz_graph(
    spark: SparkSession,
    n: int,
    k: int,
    p: float,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame[i, src, dst] — Watts–Strogatz small-world graph (Nature
    1998): n nodes on a ring, each wired to its k/2 clockwise neighbors
    (the symmetric half is implied — feed ``keys={"directed": False}``),
    then each lattice edge i is rewired with probability p to a uniform
    random target.

    Determinism (same contract as :func:`rmat_graph`): edge i rewires iff
    the 60-bit md5 hash of (seed, i, "r") is below ⌊p·2^60⌋, and its new
    target is hash(seed, i, "t") mod n — no RNG state, zero shuffle, the
    oracle replays every digit. Divergence from networkx's sequential
    sampler (documented, deliberate — theirs is inherently serial): a
    rewired target equal to the source keeps the lattice edge instead of
    resampling, and duplicate targets are allowed (multigraph convention,
    as :func:`gnm_graph`; downstream canonicalization dedups)."""
    if k < 2 or k % 2 != 0:
        raise ValueError(f"k must be a positive even integer, got {k}")
    if k >= n:
        raise ValueError(f"need k < n, got k={k} n={n}")
    if not (0.0 <= p <= 1.0):
        raise ValueError(f"p must be in [0, 1], got {p}")
    half = k // 2
    thresh = int(p * _B60)
    df = spark.range(
        0, n * half, 1, num_partitions or spark.sparkContext.defaultParallelism
    )
    u = (F.col("id") / half).cast("long")
    j = F.pmod(F.col("id"), F.lit(half)) + 1
    lattice = F.pmod(u + j, F.lit(n))
    rnd = F.pmod(_h60(F.lit(str(seed)), F.col("id"), F.lit("t")), F.lit(n))
    rewire = _h60(F.lit(str(seed)), F.col("id"), F.lit("r")) < F.lit(thresh)
    dst = F.when(rewire & (rnd != u), rnd).otherwise(lattice)
    return df.select(F.col("id").alias("i"), u.alias("src"), dst.alias("dst"))


def sbm_graph(
    spark: SparkSession,
    block_sizes: list[int],
    num_edges: int,
    p_in: float = 1.0,
    p_out: float = 0.1,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame[i, src, dst, block_src, block_dst] — fixed-edge-count
    stochastic block model: each of the ``num_edges`` edges first draws an
    (ordered) block pair with probability ∝ size_a·size_b·(p_in if a==b
    else p_out) via the inverse CDF over the B² block-pair weights, then a
    uniform member within each block. Node ids are "b{a}_n{j}" so planted
    communities are readable (and recoverable as ground truth for
    Louvain/LPA/NMI benchmarks).

    The edge-skeleton SBM (fixed m, sampling with replacement — the same
    trade as :func:`gnm_graph`/:func:`zipf_graph`): per-pair Bernoulli SBM
    is O(n²) and cannot scale, while this is a pure projection over
    ``spark.range(m)`` — zero shuffle, zero driver state beyond the B²
    CDF literal (B is small by construction: block COUNT, not block
    size). Every draw is md5-u60 of (seed, edge index, tag), so runs are
    reproducible across partitionings, retries, AND engines. Self-loops
    within a block are possible and kept (document-don't-hide; callers
    canonicalize exactly as with the other generators)."""
    if not block_sizes or any(s < 1 for s in block_sizes):
        raise ValueError(f"block_sizes must be positive, got {block_sizes}")
    if not (0.0 <= p_out and 0.0 <= p_in and (p_in > 0 or p_out > 0)):
        raise ValueError("need p_in > 0 or p_out > 0")
    b = len(block_sizes)
    weights = [
        block_sizes[i] * block_sizes[j] * (p_in if i == j else p_out)
        for i in range(b)
        for j in range(b)
    ]
    total = sum(weights)
    if total <= 0:
        raise ValueError("all block-pair weights are zero")
    cums, acc = [], 0.0
    for w in weights:
        acc += w / total
        cums.append(acc)
    cums[-1] = 1.0 + 1e-12  # guard the top boundary against float dust

    df = spark.range(
        0, num_edges, 1,
        num_partitions or spark.sparkContext.defaultParallelism,
    )
    seed_s = F.lit(str(seed))
    u = (_h60(seed_s, F.col("id"), F.lit("bp")) + 0.5) / float(1 << 60)
    # first CDF index with cum > u: B² is small, one vectorized JVM filter
    pair_idx = F.size(
        F.filter(F.lit(cums), lambda c: c < u)
    )
    ba = (pair_idx / b).cast("int").alias("block_src")
    bb = F.pmod(pair_idx, F.lit(b)).cast("int").alias("block_dst")
    sizes = F.lit(block_sizes)
    out = df.select(F.col("id").alias("i"), ba, bb)
    return out.select(
        "i",
        F.concat(
            F.lit("b"), F.col("block_src"), F.lit("_n"),
            F.pmod(
                _h60(seed_s, F.col("i"), F.lit("u")),
                F.element_at(sizes, F.col("block_src") + 1),
            ),
        ).alias("src"),
        F.concat(
            F.lit("b"), F.col("block_dst"), F.lit("_n"),
            F.pmod(
                _h60(seed_s, F.col("i"), F.lit("v")),
                F.element_at(sizes, F.col("block_dst") + 1),
            ),
        ).alias("dst"),
        "block_src",
        "block_dst",
    )
