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
