"""Event-sequence analytics: first-touch funnels and cohort retention.

Beyond the reference (no event analytics in ``mercury/``); these are the
bread-and-butter queries of any event-log engine, and both are expressible
WITHOUT per-user windows — the repo's standing rule (a 10M-event power
user must not serialize one task).

- ``funnel``: first-touch semantics — a user converts step i iff some
  step-i event happens STRICTLY AFTER the user's conversion time of step
  i−1 (conversion time = earliest qualifying occurrence). Each stage is
  one filtered join against the (user, prev_time) table + one algebraic
  min — k−1 joins total for a k-step funnel, every one on the user key.
- ``retention``: classic cohort table — cohort = each user's first-ever
  event period; retention[c, k] = fraction of cohort c active in period
  c+k. Two groupBys and one join, all algebraic.

Scale shape: every aggregate is a map-side-combinable min/count on the
user key; the per-step tables are user-sized (≤ one row per user), so the
stage joins shrink as the funnel deepens. No window, no collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """First-touch funnel over an event log — DataFrame
    [step (1-based int), step_name, users, conv_from_prev, conv_overall],
    one row per step in order. ``conv_from_prev`` for step 1 is 1.0."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate step names in {steps!r}")
    spark = df.sparkSession
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    )
    # stage 1: earliest occurrence of the first step per user
    cur = (
        ev.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_conv"))
    )
    counts = [cur.count()]
    for s in steps[1:]:
        cur = (
            ev.filter(F.col("_t") == s)
            .join(cur.select("_u", F.col("_conv").alias("_prev")), "_u")
            .filter(F.col("_ts") > F.col("_prev"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_conv"))
        )
        counts.append(cur.count())
    rows = []
    for i, (name, n) in enumerate(zip(steps, counts)):
        prev = counts[i - 1] if i else counts[0]
        rows.append(
            (
                i + 1,
                name,
                n,
                (n / prev) if prev else 0.0,
                (n / counts[0]) if counts[0] else 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "step int, step_name string, users long, conv_from_prev double, "
        "conv_overall double",
    )


def retention(
    df: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention — DataFrame [cohort (timestamp), offset (int),
    active_users, cohort_size, retention]: of the users whose FIRST event
    fell in period ``cohort``, the fraction with any event ``offset``
    periods later. ``offset`` 0 is the cohort itself (retention 1.0);
    periods are ``date_trunc`` buckets (``'day'|'week'|'month'``)."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day|week|month, got {period!r}")
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.date_trunc(period, F.col(ts_col)).alias("_p"),
    ).distinct()
    first = ev.groupBy("_u").agg(F.min("_p").alias("_c"))
    sizes = first.groupBy("_c").agg(F.count(F.lit(1)).alias("cohort_size"))
    if period == "month":
        off = F.floor(F.months_between(F.col("_p"), F.col("_c"))).cast("int")
    else:
        days = F.datediff(F.col("_p"), F.col("_c"))
        off = F.floor(days / (7 if period == "week" else 1)).cast("int")
    act = (
        ev.join(first, "_u")
        .select("_c", off.alias("offset"), "_u")
        .groupBy("_c", "offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    out = act.join(sizes, "_c").select(
        F.col("_c").alias("cohort"),
        "offset",
        "active_users",
        "cohort_size",
        (F.col("active_users").cast("double") / F.col("cohort_size")).alias(
            "retention"
        ),
    )
    if max_offset is not None:
        out = out.filter(F.col("offset") <= max_offset)
    return out
