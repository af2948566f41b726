"""Mergeable frequency sketches — count-min (Cormode & Muthukrishnan '05).

The heavy-hitter / frequency-estimation primitive for corpus-scale key
streams: a depth×width counter grid where each occurrence of a key
increments one cell per row (cell = row-salted hash of the key), and a
key's estimate is the MIN over its depth cells — an upper bound on the true
count that overshoots by at most εN with probability 1−δ (ε = e/width,
δ = e^−depth). Sketches are linear, so they merge by cellwise addition:
build per partition / per day / per shard, add, query — the property that
makes them the scale path where an exact groupBy count would have to
shuffle every key of a 100 TB corpus.

All hashing is md5-based and salted per row — a pure function of the key
bytes, reproducible across runs, partitionings, and engines (the DuckDB
oracles replay cells AND estimates byte-for-byte). Sparse representation:
only touched cells exist; absent cells read as 0.

NOT in the reference (no sketch code under ``mercury/``); companion to the
HLL-sketch HyperANF in ``linkgraph/algorithms/anf.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(col: F.Column, row: int, width: int, salt: int) -> F.Column:
    """Column index of ``col`` in sketch row ``row`` — first 48 bits of
    md5(key|row|salt) mod width (the repo-wide cross-engine hash shape)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", col, F.lit(str(row)), F.lit(str(salt)))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
    salt: int = 42,
) -> DataFrame:
    """DataFrame[row, col, cnt] — the sparse count-min sketch of
    ``key_col`` occurrences (or of ``weight_col`` sums when given).

    Plan: one scan exploding each input row into ``depth`` (row, col)
    cells (depth is a small constant) + ONE algebraic groupBy — map-side
    partial combine does the heavy lifting, and the shuffle key space is
    bounded by depth×width regardless of input size. No windows, no
    Python. Merge two sketches with :func:`cms_merge`."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"), _cell(key, j, width, salt).alias("col")
            )
            for j in range(depth)
        ]
    )
    return (
        # NULL keys dropped, same contract as bloom_build/hll_distinct/
        # kmv_sketch — otherwise every null-key row folds into one phantom
        # key and inflates the sketch's total mass N (and the εN bound)
        df.filter(key.isNotNull())
        .select(F.explode(cells).alias("_c"), w.alias("_w"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cellwise sum of two sketches built with the same (width, depth,
    salt) — count-min is linear, so the merged sketch is exactly the
    sketch of the concatenated inputs."""
    return (
        a.unionByName(b).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    salt: int = 42,
) -> DataFrame:
    """DataFrame[key_col, est] — the count-min estimate (min over depth
    cells; absent cells are 0) for every row of ``keys``. The sketch side
    is depth×width at most — broadcast it; the keys side is one scan +
    one algebraic min aggregate."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        key.alias(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cell(key, j, width, salt).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_c"),
    ).select(key_col, F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .select(key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
    salt: int = 42,
) -> DataFrame:
    """DataFrame[*group_cols, est] — HyperLogLog distinct-count estimate of
    ``key_col`` (per group when ``group_cols`` given), the cardinality
    member of the sketch family (count-min = frequency, HLL = distinct).

    Unlike Spark's built-in ``approx_count_distinct`` (opaque binary
    DataSketches state) every step here is engine-replayable: the md5-48
    of a key splits into a register index (first ``p`` bits) and a 48-p
    bit suffix whose leading-zero run (ρ = 49-p-bitlength, ρ = 49-p for a
    zero suffix) feeds a per-register MAX; the estimate is the classic
    α_m·m²/Σ2^(−M_j) with empty registers contributing 2⁰ and the
    small-range linear-counting correction m·ln(m/V) when E ≤ 2.5m and
    zero registers exist (Flajolet et al. '07). Both the registers AND the
    arithmetic are pure functions of the key bytes — a DuckDB oracle
    reproduces the estimate bit-for-bit.

    Plan: one scan + TWO algebraic aggregates (per-register max, then the
    per-group fold over ≤ 2^p register rows — state is 2^p per group
    regardless of input size). Relative error ≈ 1.04/√2^p (~3.2% at
    p=10). No windows, no Python."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    g = list(group_cols or [])
    key = F.col(key_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", key, F.lit(str(salt)))), 1, 12),
        16,
        10,
    ).cast("long")
    suffix_bits = 48 - p
    reg = (h / F.lit(1 << suffix_bits)).cast("long")
    w = h % F.lit(1 << suffix_bits)
    rho = F.when(w == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits + 1) - F.length(F.bin(w))
    )
    regs = (
        df.filter(key.isNotNull())
        .select(*g, reg.alias("_reg"), rho.alias("_rho"))
        .groupBy(*g, "_reg")
        .agg(F.max("_rho").alias("_M"))
    )
    folded = regs.groupBy(*g).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("_M"))).alias("_s"),
        F.count(F.lit(1)).alias("_used"),
    )
    zeros = F.lit(m) - F.col("_used")
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return folded.select(*g, est.alias("est"))


def kmv_sketch(
    df: DataFrame,
    set_col: str,
    key_col: str,
    k: int = 256,
    salt: int = 42,
) -> DataFrame:
    """DataFrame[set_col, ks: array<long>] — the KMV (k-minimum-values)
    sketch of each set: the k smallest distinct md5-48 hash values of its
    keys, sorted ascending. The set-operation member of the sketch family
    (count-min = frequency, HLL = cardinality, KMV = intersections): two
    sets' sketches estimate their Jaccard overlap — the "how much does
    corpus shard A overlap shard B" question — without ever joining the
    raw key sets.

    Plan: distinct (set, key) → hash → per-set k-smallest. The top-k is a
    rank-filtered window, the one shape this engine otherwise avoids —
    here Spark rewrites ``rn <= k`` into WindowGroupLimit with a Partial
    mode BEFORE the exchange, so each map task forwards at most k rows per
    set (the stratified_sample precedent; a hash tie is broken by key for
    absolute determinism). No Python anywhere."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    key = F.col(key_col).cast("string")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("_k"), F.lit(str(salt)))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    pairs = (
        df.filter(key.isNotNull())
        .select(F.col(set_col), key.alias("_k"))
        .distinct()
        .select(set_col, F.col("_k"), h.alias("_h"))
    )
    w = Window.partitionBy(set_col).orderBy(F.asc("_h"), F.asc("_k"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(set_col)
        .agg(F.array_sort(F.collect_list("_h")).alias("ks"))
    )


def kmv_jaccard(
    sketches: DataFrame, k: int | None = None, set_col: str | None = None
) -> DataFrame:
    """DataFrame[set1, set2, est] — KMV Jaccard estimate for every pair of
    sketched sets (set1 < set2): merge the two sketches, keep the k
    smallest distinct values of the union, and count how many of those
    appear in BOTH sketches (Beyer et al., SIGMOD'07). Exact whenever both
    sets had ≤ k keys (the sketches are then the full hash sets).

    ``k`` MUST equal the ``kmv_sketch`` build k — a larger k silently
    biases estimates low (union values past a sketch's capacity look like
    non-members). The default (None) infers it as the largest observed
    sketch size, which equals the build k whenever any set was sketched
    at capacity; pass k explicitly when every set is smaller than that.

    Pure JVM array math on ≤ 2k-element arrays per pair — the pair join is
    over SKETCH rows (one per set), never over the raw keys."""
    set_col = set_col or sketches.columns[0]
    if k is None:
        k = sketches.agg(F.max(F.size("ks"))).collect()[0][0] or 1
    a = sketches.select(
        F.col(set_col).alias("set1"), F.col("ks").alias("_ka")
    )
    b = sketches.select(
        F.col(set_col).alias("set2"), F.col("ks").alias("_kb")
    )
    uni = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("_ka"), F.col("_kb")))),
        1,
        k,
    )
    both = F.size(
        F.array_intersect(F.array_intersect(uni, F.col("_ka")), F.col("_kb"))
    )
    return (
        a.join(b, F.col("set1") < F.col("set2"))
        .select(
            "set1",
            "set2",
            (both.cast("double") / F.size(uni).cast("double")).alias("est"),
        )
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m: int = 1 << 16,
    n_hashes: int = 5,
    salt: int = 42,
) -> DataFrame:
    """DataFrame[pos] — the set bits of a Bloom filter over ``key_col``
    (sparse representation: only set positions exist). The membership
    member of the sketch family, and the classic join pre-filter at scale:
    build on the small/selective side, semi-filter the 100 TB side with
    :func:`bloom_contains` before the real join — false positives only
    cost wasted join work, never correctness.

    Each key sets ``n_hashes`` positions (row-salted md5 mod m, the same
    cross-engine hash as count-min). Build = one explode scan + ONE
    distinct over at most m positions. False-positive rate ≈
    (1 − e^(−kn/m))^k; ~2% at the defaults for n = 10⁴ keys."""
    if m < 1 or n_hashes < 1:
        raise ValueError(f"m/n_hashes must be >= 1, got {m}/{n_hashes}")
    key = F.col(key_col).cast("string")
    positions = F.array(*[_cell(key, j, m, salt) for j in range(n_hashes)])
    return (
        df.filter(key.isNotNull())
        .select(F.explode(positions).alias("pos"))
        .distinct()
    )


def bloom_contains(
    bloom: DataFrame,
    candidates: DataFrame,
    key_col: str,
    m: int = 1 << 16,
    n_hashes: int = 5,
    salt: int = 42,
) -> DataFrame:
    """``candidates`` filtered to the rows the Bloom filter MAYBE contains
    (every true member survives — no false negatives; a false positive
    survives at the documented rate). The filter side is at most m rows —
    broadcast; the candidate side is one scan + one algebraic match-count
    per row keyed on the candidate's own columns."""
    key = F.col(key_col).cast("string")
    probes = candidates.withColumn(
        "_pos",
        F.explode(F.array(*[_cell(key, j, m, salt) for j in range(n_hashes)])),
    )
    # membership per DISTINCT candidate row: every distinct probe position
    # must hit. Distinct-position counting (not a hit SUM == n_hashes):
    # duplicate candidate rows fold into one group whose summed hits would
    # be k·n_hashes and fail an equality — a FALSE NEGATIVE on a true
    # member — and two hash functions colliding on one position must not
    # double-count. The left_semi back onto the input preserves row
    # multiplicity instead of collapsing duplicates.
    members = (
        probes.join(
            F.broadcast(
                bloom.select(F.col("pos").alias("_pos"), F.lit(1).alias("_hit"))
            ),
            "_pos",
            "left",
        )
        .groupBy(*candidates.columns)
        .agg(
            F.countDistinct(
                F.when(F.col("_hit").isNotNull(), F.col("_pos"))
            ).alias("_d"),
            F.countDistinct("_pos").alias("_t"),
        )
        .filter(F.col("_d") == F.col("_t"))
        .drop("_d", "_t")
    )
    # null-SAFE semi-join back onto the input: plain column-list equality
    # drops any candidate row with a NULL in ANY attribute column — a false
    # negative on a true member, violating the documented contract
    # (ADVICE r5). eqNullSafe per column keeps those rows matched to their
    # own grouped member row.
    mem = members.select(
        *[F.col(c).alias(f"_m_{i}") for i, c in enumerate(members.columns)]
    )
    cond = None
    for i, c in enumerate(candidates.columns):
        e = F.col(c).eqNullSafe(F.col(f"_m_{i}"))
        cond = e if cond is None else cond & e
    return candidates.join(mem, cond, "left_semi")
