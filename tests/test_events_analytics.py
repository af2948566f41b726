"""funnel / retention: hand-built logs with known answers, python replay,
strictly-after semantics, guards."""

import datetime as dt

import pytest

from linkgraph.pipeline.events import funnel, retention


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, d, h)) for u, t, d, h in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_basic(spark):
    rows = [
        # u1 completes view -> click -> buy in order
        (1, "view", 1, 0), (1, "click", 1, 1), (1, "buy", 1, 2),
        # u2 views then clicks; no buy
        (2, "view", 1, 0), (2, "click", 2, 0),
        # u3 clicks BEFORE viewing — click must not count
        (3, "click", 1, 0), (3, "view", 1, 1),
        # u4 never views
        (4, "click", 1, 0), (4, "buy", 1, 1),
    ]
    out = {r["step_name"]: r for r in funnel(_ev(spark, rows), ["view", "click", "buy"]).collect()}
    assert out["view"]["users"] == 3          # u1 u2 u3
    assert out["click"]["users"] == 2         # u1 u2 (u3's click precedes view)
    assert out["buy"]["users"] == 1           # u1
    assert out["view"]["conv_from_prev"] == pytest.approx(1.0)
    assert out["click"]["conv_from_prev"] == pytest.approx(2 / 3)
    assert out["buy"]["conv_from_prev"] == pytest.approx(1 / 2)
    assert out["buy"]["conv_overall"] == pytest.approx(1 / 3)
    assert [r["step"] for r in sorted(out.values(), key=lambda r: r["step"])] == [1, 2, 3]


def test_funnel_strictly_after_and_first_touch(spark):
    # u1's only click is simultaneous with its first view -> NOT strictly
    # after -> no conversion; u2 clicks after its SECOND view but after the
    # first (first-touch anchor) -> converts
    rows = [
        (1, "view", 1, 0), (1, "click", 1, 0),
        (2, "view", 1, 0), (2, "view", 3, 0), (2, "click", 2, 0),
    ]
    out = {r["step_name"]: r for r in funnel(_ev(spark, rows), ["view", "click"]).collect()}
    assert out["view"]["users"] == 2
    assert out["click"]["users"] == 1


def test_funnel_zero_first_step(spark):
    rows = [(1, "click", 1, 0)]
    out = funnel(_ev(spark, rows), ["view", "click"]).collect()
    assert [r["users"] for r in sorted(out, key=lambda r: r["step"])] == [0, 0]
    assert all(r["conv_overall"] == 0.0 for r in out)


def test_funnel_guards(spark):
    df = _ev(spark, [(1, "view", 1, 0)])
    with pytest.raises(ValueError):
        funnel(df, [])
    with pytest.raises(ValueError):
        funnel(df, ["view", "view"])


def test_retention_weekly_closed_form(spark):
    # cohort W0 = {u1, u2}: u1 active W0+W1, u2 active W0+W2
    # cohort W1 = {u3}: active W1 only
    rows = [
        (1, "view", 1, 0), (1, "view", 8, 0),
        (2, "view", 2, 0), (2, "view", 16, 0),
        (3, "view", 8, 0),
    ]
    out = retention(_ev(spark, rows), period="week")
    got = {(str(r["cohort"])[:10], r["offset"]): (r["active_users"], r["retention"])
           for r in out.collect()}
    # 2024-01-01 is a Monday: days 1-7 week0, 8-14 week1, 15-21 week2
    assert got[("2024-01-01", 0)] == (2, pytest.approx(1.0))
    assert got[("2024-01-01", 1)] == (1, pytest.approx(0.5))
    assert got[("2024-01-01", 2)] == (1, pytest.approx(0.5))
    assert got[("2024-01-08", 0)] == (1, pytest.approx(1.0))
    assert len(got) == 4


def test_retention_daily_max_offset(spark):
    rows = [(1, "view", 1, 0), (1, "view", 2, 0), (1, "view", 5, 0)]
    out = retention(_ev(spark, rows), period="day", max_offset=1).collect()
    assert sorted(r["offset"] for r in out) == [0, 1]


def test_retention_guard(spark):
    with pytest.raises(ValueError):
        retention(_ev(spark, [(1, "v", 1, 0)]), period="hour")
