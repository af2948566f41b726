"""Sequence packing: offset binning, oversize docs, determinism."""

import pytest

from linkgraph.pipeline.packing import pack_sequences, pack_token_totals


def _pack(spark, rows, budget):
    df = spark.createDataFrame(rows, ["doc", "grp", "toks"])
    out = pack_sequences(df, budget, "toks", "doc", ["grp"])
    return {r.doc: r.pack for r in out.collect()}


def test_offset_binning_exact(spark):
    # group g: lengths 4,3,2,5 ordered by doc -> starts 0,4,7,9
    rows = [("d1", "g", 4), ("d2", "g", 3), ("d3", "g", 2), ("d4", "g", 5)]
    assert _pack(spark, rows, 8) == {"d1": 0, "d2": 0, "d3": 0, "d4": 1}
    assert _pack(spark, rows, 5) == {"d1": 0, "d2": 0, "d3": 1, "d4": 1}


def test_oversize_doc_spans_windows(spark):
    # 12-token doc under budget 5 starts at 0 (pack 0); next doc starts at
    # offset 12 -> pack 2, pack 1 is an empty budget window inside the big doc
    rows = [("a", "g", 12), ("b", "g", 2)]
    assert _pack(spark, rows, 5) == {"a": 0, "b": 2}


def test_groups_independent_and_deterministic(spark):
    rows = [(f"d{i}", f"g{i % 3}", 3 + i % 4) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc", "grp", "toks"])
    p1 = {(r.grp, r.doc): r.pack for r in
          pack_sequences(df, 10, "toks", "doc", ["grp"]).collect()}
    p2 = {(r.grp, r.doc): r.pack for r in
          pack_sequences(df.repartition(7), 10, "toks", "doc", ["grp"]).collect()}
    assert p1 == p2  # partitioning-independent
    # python replay per group
    by_grp = {}
    for doc, grp, toks in sorted(rows):
        start = by_grp.get(grp, 0)
        assert p1[(grp, doc)] == start // 10
        by_grp[grp] = start + toks


def test_pack_totals_bounded(spark):
    rows = [(f"d{i:02d}", "g", 7) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc", "grp", "toks"])
    packed = pack_sequences(df, 20, "toks", "doc", ["grp"])
    totals = pack_token_totals(packed, "toks", ["grp"])
    for r in totals.collect():
        # every pack holds <= budget + one straddling doc's overhang
        assert r.pack_tokens <= 20 + 7 - 1
        assert r.n_docs >= 1


def test_validation(spark):
    df = spark.createDataFrame([("d", "g", 1)], ["doc", "grp", "toks"])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, 0, "toks", "doc", ["grp"])
    with pytest.raises(ValueError, match="part_cols"):
        pack_sequences(df, 10, "toks", "doc", [])
