"""Single-pass column profiler — exact stats vs hand computation."""

import pytest

from linkgraph.pipeline.profiling import profile_columns


ROWS = [
    (1, 10.0, "a"),
    (2, 20.0, "b"),
    (3, None, "b"),
    (4, 40.0, None),
    (None, 50.0, "c"),
]


def _prof(spark, cols=None):
    df = spark.createDataFrame(ROWS, "k int, x double, s string")
    return {
        r["column"]: r.asDict() for r in profile_columns(df, cols).collect()
    }


def test_counts_and_numeric_stats(spark):
    p = _prof(spark)
    assert set(p) == {"k", "x", "s"}
    for c in p:
        assert p[c]["n_rows"] == 5
    assert p["k"]["n_null"] == 1 and p["k"]["n_distinct"] == 4
    assert p["x"]["n_null"] == 1 and p["x"]["n_distinct"] == 4
    assert p["s"]["n_null"] == 1 and p["s"]["n_distinct"] == 3
    assert p["k"]["mean"] == pytest.approx(2.5)
    assert p["k"]["p50"] == pytest.approx(2.5)  # interpolated median of 1..4
    assert p["x"]["mean"] == pytest.approx(30.0)
    assert p["x"]["p50"] == pytest.approx(30.0)
    assert p["s"]["mean"] is None and p["s"]["p50"] is None


def test_column_subset_and_validation(spark):
    p = _prof(spark, ["x"])
    assert set(p) == {"x"}
    df_cols_err = pytest.raises(ValueError, _prof, spark, ["nope"])
    assert "unknown columns" in str(df_cols_err.value)
    with pytest.raises(ValueError):
        _prof(spark, [])


def test_single_aggregate_plan(spark):
    df = spark.createDataFrame(ROWS, "k int, x double, s string")
    plan = profile_columns(df)._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        profile_columns(df)._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in plan
    assert "Window" not in plan
    # exactness cost is the documented Expand, not a per-column re-scan
    assert plan.count("Scan ExistingRDD") <= 1 or plan.count("Scan") <= 2


# ---- histogram -------------------------------------------------------------


def test_histogram_matches_numpy(spark):
    import numpy as np

    from linkgraph.pipeline.profiling import histogram

    vals = [0.0, 0.1, 2.5, 2.5, 4.9, 5.0, 3.3, 1.7, 4.999]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["bin"]: r["n"] for r in histogram(df, "x", 5, lo=0.0, hi=5.0).collect()}
    exp, _ = np.histogram(vals, bins=5, range=(0.0, 5.0))
    assert got == {i: int(c) for i, c in enumerate(exp)}


def test_histogram_auto_range_nulls_outliers(spark):
    from linkgraph.pipeline.profiling import histogram

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,)], "x double"
    )
    rows = histogram(df, "x", 2).collect()
    assert [(r["bin"], r["n"]) for r in sorted(rows, key=lambda r: r["bin"])] == [
        (0, 1), (1, 2)  # [1,2) → {1}; [2,3] → {2,3}
    ]
    # explicit range excludes outliers
    df2 = spark.createDataFrame([(0.5,), (1.5,), (99.0,)], "x double")
    rows2 = histogram(df2, "x", 2, lo=0.0, hi=2.0).collect()
    assert sum(r["n"] for r in rows2) == 2


def test_histogram_validation(spark):
    import pytest as _pt

    from linkgraph.pipeline.profiling import histogram

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pt.raises(ValueError):
        histogram(df, "x", 0)
    with _pt.raises(ValueError):
        histogram(df, "x", 2, lo=5.0, hi=1.0)
    empty = spark.createDataFrame([(None,)], "x double")
    with _pt.raises(ValueError):
        histogram(empty, "x", 2)
