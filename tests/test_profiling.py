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
