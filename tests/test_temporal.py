"""As-of join and sessionization: pandas merge_asof parity, gap logic."""

import datetime as dt

import pandas as pd
import pytest

from linkgraph.pipeline.temporal import asof_join, sessionize


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [("u1", _ts(0), "l0"), ("u1", _ts(5), "l1"), ("u1", _ts(10), "l2"),
         ("u2", _ts(3), "l3")],
        ["user", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [("u1", _ts(4), 10.0), ("u1", _ts(10), 20.0), ("u2", _ts(9), 30.0)],
        ["user", "ts", "price"],
    )
    out = {r.lid: r.price for r in
           asof_join(left, right, on="ts", by=["user"]).collect()}
    # l0: nothing at/before 10:00 -> null; l1: 10:04 row; l2: the
    # SIMULTANEOUS 10:10 row (<=, not <); l3: u2 has nothing yet
    assert out == {"l0": None, "l1": 10.0, "l2": 20.0, "l3": None}


def test_asof_matches_pandas_merge_asof(spark):
    import random

    rng = random.Random(5)
    lrows = [(f"u{i % 7}", _ts(rng.randrange(60), rng.randrange(60)), i)
             for i in range(300)]
    rrows = [(f"u{i % 7}", _ts(rng.randrange(60), rng.randrange(60)), float(i))
             for i in range(150)]
    # dedupe right (key, ts) so the latest-at-equal-ts rule is unambiguous
    seen = {}
    for u, ts, v in rrows:
        seen[(u, ts)] = v
    rrows = [(u, ts, v) for (u, ts), v in seen.items()]
    left = spark.createDataFrame(lrows, ["user", "ts", "lid"])
    right = spark.createDataFrame(rrows, ["user", "ts", "val"])
    got = {r.lid: r.val for r in
           asof_join(left, right, on="ts", by=["user"]).collect()}
    lp = pd.DataFrame(lrows, columns=["user", "ts", "lid"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["user", "ts", "val"]).sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="user", direction="backward")
    refd = {
        int(r.lid): (None if pd.isna(r.val) else float(r.val))
        for r in ref.itertuples()
    }
    assert got == refd


def test_asof_tolerance(spark):
    left = spark.createDataFrame([("u", _ts(30), "l")], ["user", "ts", "lid"])
    right = spark.createDataFrame([("u", _ts(0), 1.0)], ["user", "ts", "v"])
    fresh = asof_join(left, right, on="ts", by=["user"]).collect()[0]
    assert fresh.v == 1.0  # no tolerance: 30-minute-old state matches
    stale = asof_join(
        left, right, on="ts", by=["user"], tolerance="10 minutes"
    ).collect()[0]
    assert stale.v is None  # tolerance nulls matches older than 10 min
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("v", "lid"), "ts", ["user"])


def test_sessionize_gap_boundaries(spark):
    rows = [
        ("u", _ts(0), 1), ("u", _ts(10), 2),   # same session (gap 10 <= 15)
        ("u", _ts(26), 3),                      # 16 min gap -> new session
        ("u", _ts(41, 1), 4),                   # 15m1s > 15m -> new session
        ("v", _ts(0), 5),                       # other key: own session 0
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "eid"])
    out = {r.eid: r.session for r in
           sessionize(df, "15 minutes", ["user"], order_cols=["eid"]).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 0}
    # exactly-at-gap is the SAME session (strict >)
    df2 = spark.createDataFrame(
        [("u", _ts(0), 1), ("u", _ts(15), 2)], ["user", "ts", "eid"]
    )
    out2 = {r.eid: r.session for r in
            sessionize(df2, "15 minutes", ["user"], order_cols=["eid"]).collect()}
    assert out2 == {1: 0, 2: 0}


def test_sessionize_deterministic_under_repartition(spark):
    rows = [("u", _ts(i // 4, (i * 7) % 60), i) for i in range(80)]
    df = spark.createDataFrame(rows, ["user", "ts", "eid"])
    a = {r.eid: r.session for r in
         sessionize(df, "2 minutes", ["user"], order_cols=["eid"]).collect()}
    b = {r.eid: r.session for r in
         sessionize(df.repartition(9), "2 minutes", ["user"],
                    order_cols=["eid"]).collect()}
    assert a == b


def test_range_join_inner_and_left(spark):
    from linkgraph.pipeline.temporal import range_join

    pts = spark.createDataFrame(
        [("p1", 5.0), ("p2", 15.0), ("p3", 25.0), ("p4", 99.0)],
        ["pid", "v"],
    )
    ivs = spark.createDataFrame(
        [("t0", 0.0, 10.0), ("t1", 10.0, 20.0), ("t2", 3.0, 30.0)],
        ["tier", "lo", "hi"],
    )
    got = {(r.pid, r.tier) for r in
           range_join(pts, ivs, "v", "lo", "hi", bucket_size=7.0).collect()}
    # overlapping intervals: every containing interval matches; boundaries
    # inclusive on both ends
    assert got == {("p1", "t0"), ("p1", "t2"), ("p2", "t1"), ("p2", "t2"),
                   ("p3", "t2")}
    left = range_join(pts, ivs, "v", "lo", "hi", 7.0, how="left")
    rows = {(r.pid, r.tier) for r in left.collect()}
    assert ("p4", None) in rows and len(rows) == 6
    import pytest as _pt
    with _pt.raises(ValueError, match="bucket_size"):
        range_join(pts, ivs, "v", "lo", "hi", 0)


def test_range_join_bucket_size_invariance(spark):
    import random

    from linkgraph.pipeline.temporal import range_join

    rng = random.Random(3)
    pts = spark.createDataFrame(
        [(i, rng.uniform(0, 100)) for i in range(200)], ["pid", "v"]
    )
    ivs = []
    for i in range(40):
        lo = rng.uniform(0, 95)
        ivs.append((i, lo, lo + rng.uniform(0, 12)))
    ivdf = spark.createDataFrame(ivs, ["tier", "lo", "hi"])
    a = {(r.pid, r.tier) for r in
         range_join(pts, ivdf, "v", "lo", "hi", 1.0).collect()}
    b = {(r.pid, r.tier) for r in
         range_join(pts, ivdf, "v", "lo", "hi", 33.0).collect()}
    assert a == b  # bucket size is a physical knob, never a semantic one
    # brute-force reference
    ref = {(p, t) for p, v in
           [(i, x) for i, x in [(r[0], r[1]) for r in pts.collect()]]
           for t, lo, hi in ivs if lo <= v <= hi}
    assert a == ref


def test_range_join_left_with_null_left_columns(spark):
    from linkgraph.pipeline.temporal import range_join

    # a matched left row carrying a NULL attribute must appear exactly once
    # (null-safe anti-join — plain equality would re-emit it as unmatched)
    pts = spark.createDataFrame(
        [(1, 5.0, None), (2, 50.0, "x")],
        "pid long, v double, tag string",
    )
    ivs = spark.createDataFrame(
        [(0.0, 10.0, "low")], "lo double, hi double, tier string"
    )
    out = range_join(pts, ivs, "v", "lo", "hi", bucket_size=7.0, how="left")
    rows = sorted(out.collect(), key=lambda r: r["pid"])
    assert len(rows) == 2
    assert rows[0]["pid"] == 1 and rows[0]["tier"] == "low"
    assert rows[1]["pid"] == 2 and rows[1]["tier"] is None
