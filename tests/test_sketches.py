"""Count-min sketch — python replay, upper-bound/exactness, linearity."""

import hashlib
from collections import Counter

import pytest

from linkgraph.pipeline.sketches import cms_lookup, cms_merge, count_min_sketch


def _cell(key, row, width, salt=42):
    h = hashlib.md5(f"{key}|{row}|{salt}".encode()).hexdigest()[:12]
    return int(h, 16) % width


def _replay_sketch(keys, width, depth):
    cells = Counter()
    for k in keys:
        for j in range(depth):
            cells[(j, _cell(k, j, width))] += 1
    return cells


def _replay_lookup(cells, key, width, depth):
    return min(cells.get((j, _cell(key, j, width)), 0) for j in range(depth))


KEYS = ["a", "b", "b", "c", "c", "c", "dup", "dup", "x1", "x2", "x3"] * 3


def test_sketch_cells_match_python_replay(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], ["k"])
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in count_min_sketch(df, "k", width=16, depth=3).collect()
    }
    assert got == dict(_replay_sketch(KEYS, 16, 3))


def test_lookup_upper_bounds_and_replay(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], ["k"])
    sk = count_min_sketch(df, "k", width=16, depth=3)
    keys = spark.createDataFrame([(k,) for k in sorted(set(KEYS))], ["k"])
    got = {
        r["k"]: r["est"]
        for r in cms_lookup(sk, keys, "k", width=16, depth=3).collect()
    }
    true = Counter(KEYS)
    cells = _replay_sketch(KEYS, 16, 3)
    for k, t in true.items():
        assert got[k] >= t  # CMS never undercounts
        assert got[k] == _replay_lookup(cells, k, 16, 3)


def test_wide_sketch_is_exact(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], ["k"])
    sk = count_min_sketch(df, "k", width=4096, depth=4)
    keys = spark.createDataFrame([(k,) for k in sorted(set(KEYS))], ["k"])
    got = {
        r["k"]: r["est"]
        for r in cms_lookup(sk, keys, "k", width=4096, depth=4).collect()
    }
    assert got == dict(Counter(KEYS))


def test_merge_equals_sketch_of_union(spark):
    half = len(KEYS) // 2
    a = spark.createDataFrame([(k,) for k in KEYS[:half]], ["k"])
    b = spark.createDataFrame([(k,) for k in KEYS[half:]], ["k"])
    both = spark.createDataFrame([(k,) for k in KEYS], ["k"])
    merged = cms_merge(
        count_min_sketch(a, "k", width=16, depth=3),
        count_min_sketch(b, "k", width=16, depth=3),
    )
    direct = count_min_sketch(both, "k", width=16, depth=3)
    as_map = lambda df: {(r["row"], r["col"]): r["cnt"] for r in df.collect()}
    assert as_map(merged) == as_map(direct)


def test_weighted_counts(spark):
    df = spark.createDataFrame([("a", 5), ("a", 2), ("b", 1)], ["k", "w"])
    sk = count_min_sketch(df, "k", width=64, depth=3, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",)], ["k"])
    got = {
        r["k"]: r["est"]
        for r in cms_lookup(sk, keys, "k", width=64, depth=3).collect()
    }
    assert got == {"a": 7, "b": 1}


def test_validation(spark):
    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError):
        count_min_sketch(df, "k", width=0)
    with pytest.raises(ValueError):
        count_min_sketch(df, "k", depth=0)


# ---- HyperLogLog ----------------------------------------------------------

import math


def _hll_replay(keys, p=10, salt=42):
    m = 1 << p
    sb = 48 - p
    regs = {}
    for k in keys:
        h = int(hashlib.md5(f"{k}|{salt}".encode()).hexdigest()[:12], 16)
        reg, w = h >> sb, h % (1 << sb)
        rho = sb + 1 if w == 0 else sb + 1 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    s = sum(2.0 ** -v for v in regs.values()) + (m - len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / s
    zeros = m - len(regs)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def test_hll_matches_python_replay_and_accuracy(spark):
    from linkgraph.pipeline.sketches import hll_distinct

    keys = [f"key{i % 5000}" for i in range(12000)]  # dups collapse
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    est = hll_distinct(df, "k", p=10).collect()[0]["est"]
    assert est == pytest.approx(_hll_replay(set(keys)), rel=1e-12)
    assert abs(est / 5000 - 1) < 0.15  # ~3.2% std error at p=10


def test_hll_small_range_linear_counting(spark):
    from linkgraph.pipeline.sketches import hll_distinct

    df = spark.createDataFrame([(f"v{i}",) for i in range(5)], ["k"])
    est = hll_distinct(df, "k", p=10).collect()[0]["est"]
    assert est == pytest.approx(_hll_replay([f"v{i}" for i in range(5)]))
    assert round(est) == 5  # linear counting is near-exact here


def test_hll_grouped_and_null_keys(spark):
    from linkgraph.pipeline.sketches import hll_distinct

    rows = [("a", f"x{i}") for i in range(30)] + [("b", "one")] + [("b", None)]
    df = spark.createDataFrame(rows, ["grp", "k"])
    got = {
        r["grp"]: r["est"]
        for r in hll_distinct(df, "k", group_cols=["grp"], p=8).collect()
    }
    assert got["a"] == pytest.approx(_hll_replay([f"x{i}" for i in range(30)], p=8))
    assert got["b"] == pytest.approx(_hll_replay(["one"], p=8))  # null dropped


def test_hll_validation(spark):
    from linkgraph.pipeline.sketches import hll_distinct

    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError):
        hll_distinct(df, "k", p=3)
    with pytest.raises(ValueError):
        hll_distinct(df, "k", p=17)


# ---- KMV -------------------------------------------------------------------


def _kmv_h(key, salt=42):
    return int(hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:12], 16)


def _kmv_replay(sets, k):
    sk = {s: sorted(_kmv_h(x) for x in xs)[:k] for s, xs in sets.items()}
    out = {}
    for s1 in sorted(sk):
        for s2 in sorted(sk):
            if s1 >= s2:
                continue
            uni = sorted(set(sk[s1]) | set(sk[s2]))[:k]
            both = sum(1 for h in uni if h in set(sk[s1]) and h in set(sk[s2]))
            out[(s1, s2)] = both / len(uni)
    return out


def _kmv_run(spark, sets, k):
    from linkgraph.pipeline.sketches import kmv_jaccard, kmv_sketch

    rows = [(s, x) for s, xs in sets.items() for x in xs]
    df = spark.createDataFrame(rows, ["grp", "key"])
    sk = kmv_sketch(df, "grp", "key", k=k)
    return {
        (r["set1"], r["set2"]): r["est"] for r in kmv_jaccard(sk, k=k).collect()
    }


def test_kmv_exact_when_sets_fit(spark):
    sets = {
        "A": [f"x{i}" for i in range(30)],
        "B": [f"x{i}" for i in range(15, 45)],  # true J = 15/45
        "C": [f"y{i}" for i in range(10)],      # disjoint from A
    }
    got = _kmv_run(spark, sets, k=256)  # k > |A∪B| → exact
    assert got[("A", "B")] == pytest.approx(15 / 45)
    assert got[("A", "C")] == 0.0
    assert got == pytest.approx(_kmv_replay(sets, 256))


def test_kmv_estimates_match_replay_and_truth(spark):
    sets = {
        "A": [f"k{i}" for i in range(2000)],
        "B": [f"k{i}" for i in range(1000, 3000)],  # true J = 1000/3000
    }
    got = _kmv_run(spark, sets, k=128)
    assert got == pytest.approx(_kmv_replay(sets, 128))
    assert abs(got[("A", "B")] - 1 / 3) < 0.12  # ~1/sqrt(k) noise


def test_kmv_duplicates_collapse(spark):
    sets = {"A": ["x", "x", "y"], "B": ["y", "y", "z"]}
    got = _kmv_run(spark, sets, k=16)
    assert got[("A", "B")] == pytest.approx(1 / 3)


def test_kmv_validation(spark):
    from linkgraph.pipeline.sketches import kmv_sketch

    df = spark.createDataFrame([("a", "x")], ["grp", "key"])
    with pytest.raises(ValueError):
        kmv_sketch(df, "grp", "key", k=0)


# ---- Bloom filter ----------------------------------------------------------


def _bloom_pos(key, j, m, salt=42):
    return int(
        hashlib.md5(f"{key}|{j}|{salt}".encode()).hexdigest()[:12], 16
    ) % m


def test_bloom_positions_match_replay(spark):
    from linkgraph.pipeline.sketches import bloom_build

    keys = [f"k{i}" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {r["pos"] for r in bloom_build(df, "k", m=512, n_hashes=3).collect()}
    exp = {_bloom_pos(k, j, 512) for k in keys for j in range(3)}
    assert got == exp


def test_bloom_no_false_negatives_and_low_fp(spark):
    from linkgraph.pipeline.sketches import bloom_build, bloom_contains

    members = [f"m{i}" for i in range(500)]
    bloom = bloom_build(
        spark.createDataFrame([(k,) for k in members], ["k"]),
        "k", m=1 << 14, n_hashes=5,
    )
    cand = spark.createDataFrame(
        [(k, "member") for k in members]
        + [(f"n{i}", "non") for i in range(2000)],
        ["k", "tag"],
    )
    kept = bloom_contains(bloom, cand, "k", m=1 << 14, n_hashes=5).collect()
    kept_members = {r["k"] for r in kept if r["tag"] == "member"}
    assert kept_members == set(members)  # NEVER a false negative
    fp = sum(1 for r in kept if r["tag"] == "non") / 2000
    assert fp < 0.05  # ~0.9% expected at these parameters


def test_bloom_null_keys_and_validation(spark):
    from linkgraph.pipeline.sketches import bloom_build

    df = spark.createDataFrame([("a",), (None,)], ["k"])
    assert bloom_build(df, "k", m=64, n_hashes=2).count() <= 2
    with pytest.raises(ValueError):
        bloom_build(df, "k", m=0)
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_hashes=0)


def test_bloom_contains_keeps_duplicate_members(spark):
    # round-5 review: duplicate candidate rows folded into one group whose
    # summed hits failed the equality — a false negative on a true member
    from linkgraph.pipeline.sketches import bloom_build, bloom_contains

    members = spark.createDataFrame([("k1",), ("k2",)], ["key"])
    bloom = bloom_build(members, "key")
    cands = spark.createDataFrame(
        [("k1", 1), ("k1", 1), ("k2", 2), ("zz-not-member", 3)],
        ["key", "payload"],
    )
    got = sorted(
        (r["key"], r["payload"])
        for r in bloom_contains(bloom, cands, "key").collect()
    )
    # both duplicate copies of the member survive; multiplicity preserved
    assert got[:2] == [("k1", 1), ("k1", 1)]
    assert ("k2", 2) in got


def test_cms_drops_null_keys(spark):
    from pyspark.sql import functions as F

    from linkgraph.pipeline.sketches import count_min_sketch

    df = spark.createDataFrame(
        [("a",), (None,), (None,), ("a",)], ["k"]
    )
    sk = count_min_sketch(df, "k", width=64, depth=2)
    # total mass per depth row = non-null rows only
    mass = sk.groupBy("row").agg(F.sum("cnt").alias("m")).collect()
    assert all(r["m"] == 2 for r in mass)


def test_kmv_jaccard_infers_build_k(spark):
    from linkgraph.pipeline.sketches import kmv_jaccard, kmv_sketch

    rows = [("A", f"x{i}") for i in range(100)] + [
        ("B", f"x{i}") for i in range(50, 150)
    ]
    df = spark.createDataFrame(rows, ["grp", "key"])
    sk = kmv_sketch(df, "grp", "key", k=32)
    # default k=None infers 32 from the sketches; a stale default of 256
    # biased the estimate low (true J = 50/150 ≈ 0.333)
    est = kmv_jaccard(sk).collect()[0]["est"]
    assert 0.15 < est < 0.55
