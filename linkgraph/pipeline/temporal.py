"""Temporal operators — as-of join and sessionization.

Beyond the reference (``mercury/graph`` has no time-aware operators);
event streams feeding a link graph (user→item interactions, commit
timelines) need exactly two temporal primitives before any graph is
built: "match each fact to the latest dimension state at its time"
(as-of join) and "cut an event stream into visits" (sessionization).

Both are expressed as per-key windows — the inherently sequential unit is
the key's own timeline, so the partition key IS the parallelism unit, the
same honest shape as sequence packing. No Python in either path; DuckDB
replays both (it has native ``ASOF JOIN``, which the oracle uses against
this implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str] | None = None,
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the MOST RECENT right row with
    ``right.on <= left.on`` within the same ``by`` key (null columns when
    no such row) — the standard backward as-of join of event/quote,
    fact/dimension-state, metric/deploy pipelines.

    Plan: union both sides tagged (right sorts before left at equal
    timestamps, so a simultaneous right row IS visible to the left row,
    matching DuckDB/pandas ``asof`` semantics), then one
    ``last(ignorenulls)`` running window per key carries the latest right
    values forward; left rows are filtered back out. One shuffle on the
    key, no join explosion, no Python. ``tolerance`` (in the units of a
    numeric ``on``, or an INTERVAL-castable string for timestamps) nulls
    matches older than ``left.on - tolerance``.

    ``right_cols`` defaults to every right column except ``on``/``by``;
    they must not collide with left column names (rename upstream)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    if not right_cols:
        raise ValueError("right side carries no value columns")
    collisions = set(right_cols) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right_cols collide with left columns: {sorted(collisions)}; "
            "rename before joining"
        )
    lt = left.select(
        *by, F.col(on), F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    rt = right.select(
        *by, F.col(on), F.lit(0).alias("_side"),
        *[F.col(c) for c in right_cols],
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_r_{c}")
            for c in right_cols
        ],
        F.last(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias("_r_ts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        if isinstance(tolerance, str):
            fresh = F.col("_r_ts") >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
        else:
            fresh = F.col("_r_ts") >= F.col(on) - F.lit(tolerance)
        out = out.select(
            "*",
            *[
                F.when(fresh, F.col(f"_r_{c}")).alias(f"_t_{c}")
                for c in right_cols
            ],
        )
        picked = [F.col(f"_t_{c}").alias(c) for c in right_cols]
    else:
        picked = [F.col(f"_r_{c}").alias(c) for c in right_cols]
    return out.select(*[F.col("_lrow")[c].alias(c) for c in left.columns], *picked)


def sessionize(
    events: DataFrame,
    gap: str,
    key_cols: list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
    out: str = "session",
) -> DataFrame:
    """Append ``out``: a 0-based session index per key — a new session
    starts when the gap since the previous event exceeds ``gap`` (an
    INTERVAL string like ``'30 minutes'``). Ordering within a key is
    (ts, *order_cols) — pass a unique tiebreaker (event id) for full
    determinism under equal timestamps. Session ids are LOCAL to the key
    (global key = key_cols + [out]), the same convention as sequence
    packing."""
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    brk = (
        F.col(ts_col)
        > F.lag(ts_col).over(w) + F.expr(f"INTERVAL {gap}")
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        out, F.sum(F.coalesce(brk, F.lit(0))).over(wsum).cast("long")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_size: float,
    by: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every right interval with
    ``lo <= value <= hi`` (optionally within the same ``by`` key) — the
    ip-to-block / value-to-tier / point-in-window primitive.

    Scale shape: a naive inequality join is a nested-loop cross product.
    Here both sides are EQUI-joined on a coarse bucket — left rows at
    ``floor(value / bucket_size)``, each interval EXPLODED to the buckets
    it covers — then the exact predicate filters within buckets. Pick
    ``bucket_size`` near the median interval width: an interval spanning B
    buckets emits B rows (that is the whole cost model — one row per
    covered bucket, no cross product), and left rows never replicate.

    ``how="left"`` keeps unmatched left rows with null right columns.
    Right columns must not collide with left's (rename upstream; checked).
    """
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be > 0, got {bucket_size}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by = by or []
    rcols = [c for c in right.columns if c not in by]
    collisions = set(rcols) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right columns collide with left: {sorted(collisions)}; "
            "rename before joining"
        )
    bs = float(bucket_size)
    lb = left.withColumn("_bkt", F.floor(F.col(value_col) / F.lit(bs)))
    rb = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bs)),
                F.floor(F.col(hi_col) / F.lit(bs)),
            )
        ),
    )
    cond = [lb["_bkt"] == rb["_bkt"]] + [lb[k] == rb[k] for k in by]
    matched = (
        lb.join(rb, cond, "inner")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) <= F.col(hi_col))
        )
        .select(*[lb[c] for c in left.columns], *[rb[c] for c in rcols])
    )
    if how == "inner":
        return matched
    # null-safe anti-join: plain column equality treats NULL != NULL, so a
    # matched left row carrying a null column would ALSO come back as
    # "missing" and the row would be emitted twice
    mkeys = matched.select(*[F.col(c).alias(f"_m_{c}") for c in left.columns])
    anti = [left[c].eqNullSafe(mkeys[f"_m_{c}"]) for c in left.columns]
    missing = left.join(mkeys, anti, "left_anti").select(
        "*", *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols]
    )
    return matched.unionByName(missing)
