"""Single-pass column profiling — the data-QA pass a corpus ingest runs
before anything else: per-column row/null/distinct counts plus mean and
exact median for numeric columns.

One scan, one global aggregate (the result is a single row that is then
unpivoted driver-free with ``stack``); the per-column exact DISTINCTs make
Catalyst plan an ``Expand`` (one input replica per distinct column — the
documented cost of exactness; swap to approx_count_distinct when a ±2%
answer is acceptable at 100 TB). No windows, no Python, no driver loops.

NOT in the reference (no profiling layer under ``mercury/``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "float", "double")


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """DataFrame[column, n_rows, n_null, n_distinct, mean, p50] — one row
    per profiled column. ``mean`` / ``p50`` (exact interpolated median) are
    null for non-numeric columns; ``n_distinct`` is exact and counts
    distinct non-null values. Decimal columns are treated as numeric."""
    if cols is None:
        cols = df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if not cols:
        raise ValueError("cols must be non-empty")
    dtypes = dict(df.dtypes)

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        numeric = dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")
        aggs.append(F.count(F.col(c)).alias(f"_nn{i}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd{i}"))
        if numeric:
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"_mean{i}"))
            aggs.append(
                F.percentile(F.col(c).cast("double"), F.lit(0.5)).alias(
                    f"_p50{i}"
                )
            )
    one = df.agg(*aggs)

    parts = []
    for i, c in enumerate(cols):
        numeric = dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")
        mean = f"_mean{i}" if numeric else "CAST(NULL AS DOUBLE)"
        p50 = f"_p50{i}" if numeric else "CAST(NULL AS DOUBLE)"
        parts.append(f"'{c}', _n, _n - _nn{i}, _nd{i}, {mean}, {p50}")
    stack = (
        f"stack({len(cols)}, {', '.join(parts)}) as "
        "(column, n_rows, n_null, n_distinct, mean, p50)"
    )
    return one.selectExpr(stack)


def histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """DataFrame[bin, lo, hi, n] — equal-width histogram of a numeric
    column: bin i covers [lo + i·w, lo + (i+1)·w) with w = (hi−lo)/bins,
    except the LAST bin which also includes hi itself (the numpy
    convention, so the range max is never dropped). Values outside
    [lo, hi] and nulls are excluded; empty bins are emitted with n = 0 so
    the output is always exactly ``bins`` rows.

    When lo/hi are omitted they come from one min/max aggregate (a second
    scan — pass them explicitly to keep the single-pass shape, e.g. from
    :func:`profile_columns`). The histogram itself is ONE scan + ONE
    algebraic aggregate over at most ``bins`` keys, joined against a
    driver-built bins table (``bins`` rows — broadcast). No windows, no
    Python."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    spark = df.sparkSession
    x = F.col(col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
        if lo is None:
            raise ValueError(f"column {col!r} has no non-null values")
    lo, hi = float(lo), float(hi)
    if not hi >= lo:
        raise ValueError(f"hi must be >= lo, got [{lo}, {hi}]")
    w = (hi - lo) / bins if hi > lo else 1.0
    b = F.floor((x - F.lit(lo)) / F.lit(w)).cast("int")
    b = F.when(b == bins, F.lit(bins - 1)).otherwise(b)  # hi joins last bin
    counts = (
        df.filter(x.isNotNull() & (x >= lo) & (x <= hi))
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    edges = spark.createDataFrame(
        [(i, lo + i * w, lo + (i + 1) * w) for i in range(bins)],
        "bin int, lo double, hi double",
    )
    return (
        edges.join(counts, "bin", "left")
        .select("bin", "lo", "hi", F.coalesce("n", F.lit(0)).alias("n"))
    )
