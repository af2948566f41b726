"""Deterministic dataset sampling — hash-threshold rows, no RNG state.

Beyond the reference (no sampling utilities in ``mercury/graph``); a
training-data pipeline needs samples that are REPRODUCIBLE (same rows on
every run, every engine, every partitioning — ``df.sample()`` is none of
those: it is seeded per-partition, so a repartition draws a different
sample) and COORDINATED (the same document must land in the same split in
the text table and the embedding table).

The primitive: a row is kept iff the first 8 hex chars of
``md5(key <0x1f> … <0x1f> seed)`` fall below ``rate``'s threshold — a
pure column expression, engine-portable (DuckDB oracles replay it
verbatim), granular to 16⁻⁸ ≈ 4e-10. Key-based thresholding also gives
consistent train/val/test splits: disjoint rate intervals of the SAME
hash partition the keyspace, so no key ever leaks across splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_SPACE = 16**8


def _bucket(key_cols: list[str], seed: int) -> F.Column:
    """Uniform hex bucket in [0, 16^8) as an 8-char lowercase hex string.

    NULL key components are encoded as a \\x00 sentinel BEFORE the
    concat_ws: concat_ws silently SKIPS nulls, which would make
    ('x', NULL) and (NULL, 'x') hash identically and fold every all-NULL
    key onto one bucket — an entire null-key population then rides one
    coin flip instead of sampling at the requested rate. (\\x00 never
    appears in real key text; the DuckDB oracle replays use `||`, whose
    NULL propagation differs — they assume non-null keys, which holds for
    every oracle input.)"""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in key_cols
    ]
    return F.substring(
        F.md5(F.concat_ws(_SEP, *parts, F.lit(str(seed)))), 1, 8
    )


def _threshold(fraction: float) -> str:
    """``fraction`` as an 8-hex-char comparison threshold. A fraction of
    1.0 maps to 16^8, whose hex form is 9 chars and compares WRONG against
    8-char buckets lexicographically ("1b…" < "100000000" is false) — so
    saturation returns "g", which is > every hex string."""
    v = int(fraction * _SPACE)
    return "g" if v >= _SPACE else format(v, "08x")


def hash_sample(
    df: DataFrame, rate: float, key_cols: list[str], seed: int = 0
) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by key hash. Rows with
    equal keys are kept or dropped together (sample at the entity level by
    keying on the entity id, at the row level by keying on all columns)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    return df.filter(_bucket(key_cols, seed) < F.lit(_threshold(rate)))


def hash_split(
    df: DataFrame,
    weights: list[float],
    key_cols: list[str],
    seed: int = 0,
    out: str = "split",
) -> DataFrame:
    """Append a split index column (0..len(weights)−1) assigning each key to
    one split with the given proportions — disjoint and exhaustive by
    construction (consecutive intervals of one hash), stable across runs
    and across tables sharing the key."""
    if not weights or any(w < 0 for w in weights):
        raise ValueError("weights must be non-empty and non-negative")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    bucket = _bucket(key_cols, seed)
    expr = F.lit(len(weights) - 1)
    acc = 0.0
    cums = []
    for w in weights[:-1]:
        acc += w / total
        cums.append(_threshold(acc))
    for i in range(len(cums) - 1, -1, -1):
        expr = F.when(bucket < F.lit(cums[i]), F.lit(i)).otherwise(expr)
    return df.withColumn(out, expr)


def _uniform(key_cols: list[str], seed: int) -> F.Column:
    """Uniform double in (0, 1] from the md5 bucket: (n+1)/16^8 with
    n ∈ [0, 16^8) — exact in double (n < 2^32), engine-portable
    (DuckDB: CAST('0x'||h AS UBIGINT))."""
    n = F.conv(_bucket(key_cols, seed), 16, 10).cast("double")
    return (n + F.lit(1.0)) / F.lit(float(_SPACE))


def stratified_sample(
    df: DataFrame,
    k: int,
    strata_cols: list[str],
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Deterministic k rows per stratum: the k smallest md5 priorities
    within each strata group (priority then key ascending — a total order,
    so the sample is unique). The ``row_number <= k`` filter executes as
    WindowGroupLimit: each map task forwards at most k rows per group
    before the shuffle, so hot strata never materialize their full row set
    in one task. Strata with fewer than k rows are kept whole."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not strata_cols or not key_cols:
        raise ValueError("strata_cols and key_cols must be non-empty")
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        _bucket(key_cols, seed).asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


_WSCALE = 1 << 20


def temperature_sample(
    df: DataFrame,
    n_rows: int,
    group_col: str,
    key_cols: list[str],
    alpha: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based group rebalancing: sample ~``n_rows`` rows total,
    allocating each group a quota ∝ count^alpha — the standard multilingual
    / multi-source mix correction (alpha=1 keeps natural proportions,
    alpha=0 allocates every group the same quota, alpha≈0.3–0.7 upsamples
    the tail the way multilingual-corpus recipes do).

    Selection is Bernoulli by key hash at rate quota/count per group —
    expected (not exact) quotas, but the plan is ONE count aggregate over
    group-sized partials + a broadcast threshold join + a scan filter: no
    per-group sort, no window, no row_number, so a 10-billion-row group
    costs the same per row as a 10-row group. For exact-k-per-group
    semantics use :func:`stratified_sample`.

    Determinism: group weights count^alpha are quantized to integers
    (floor(·2^20)) so their sum — and therefore every group's rate — is
    exact integer math plus a fixed sequence of IEEE double ops: the same
    rows are selected on every run, every partitioning, and every engine
    (DuckDB oracles replay the thresholds bit-for-bit; alpha=0.5 uses
    sqrt, which IEEE requires correctly rounded, so even the weight
    quantization is engine-portable). Groups whose rate rounds to zero
    are dropped entirely; rates cap at 1 (a group never exceeds its own
    count)."""
    if n_rows < 0:
        raise ValueError(f"n_rows must be >= 0, got {n_rows}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    c = F.col("_c").cast("double")
    wexpr = F.sqrt(c) if alpha == 0.5 else F.pow(c, F.lit(float(alpha)))
    wts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("_w", F.floor(wexpr * F.lit(float(_WSCALE))).cast("long"))
    )
    tot = wts.agg(F.sum("_w").alias("_W"))
    th = wts.alias("g").crossJoin(F.broadcast(tot).alias("t")).select(
        F.col("g." + group_col).alias(group_col),
        F.least(
            F.lit(_SPACE).cast("long"),
            F.floor(
                F.lit(float(n_rows))
                * F.col("g._w").cast("double")
                / F.col("t._W").cast("double")
                / F.col("g._c").cast("double")
                * F.lit(float(_SPACE))
            ).cast("long"),
        ).alias("_th"),
    )
    u = F.conv(_bucket(key_cols, seed), 16, 10).cast("long")
    # null-safe group join: groupBy counted a NULL group and its weight is
    # in _W, so an equi-join (NULL never equals NULL) would silently drop
    # every null-group row while still letting its weight dilute all other
    # groups' quotas
    thr = th.withColumnRenamed(group_col, "_g")
    return (
        df.join(
            F.broadcast(thr), F.col(group_col).eqNullSafe(F.col("_g"))
        )
        .filter(u < F.col("_th"))
        .select(*df.columns)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement:
    priority = ln(u)/w with u = hash-uniform(key, seed), take the global
    top-k by priority (ln(u)/w is a monotone transform of the textbook
    u^(1/w) — same selection, one less libm call). Deterministic across
    runs/partitionings; inclusion probability ∝ weight. Executes as
    TakeOrderedAndProject — each map task forwards ≤ k rows, no global
    sort. Rows with non-positive weight are excluded (they would win with
    certainty or divide by zero)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    w = F.col(weight_col).cast("double")
    pri = F.log(_uniform(key_cols, seed)) / w
    return (
        df.filter(w > 0)
        .withColumn("_pri", pri)
        .orderBy(F.desc("_pri"), *[F.col(c).asc() for c in key_cols])
        .limit(k)
        .drop("_pri")
    )
