"""Pairwise association-rule mining (market-basket) over a basket table.

Beyond the reference (no frequent-itemset code in ``mercury/``); the
2-itemset special case is the workhorse of co-purchase/co-view analytics
and is fully expressible as capped self-join + algebraic aggregates —
no FP-tree, no candidate generation, no driver-side state.

Scale shape: baskets are deduped (group, item) rows; the pair join is the
same capped derivation as :func:`linkgraph.corpus.cooccurrence_edges`
(O(cap²) rows per basket, hub baskets bounded); supports are two
map-side-combinable counts. Rules are emitted in BOTH directions from the
canonical pair count (confidence is asymmetric, lift/support symmetric).

Semantics (classic Agrawal–Srikant, itemsets of size 1 and 2):
- support(X)     = baskets containing X / N
- confidence X→Y = support(X,Y) / support(X)
- lift X→Y       = confidence / support(Y)  (= lift Y→X)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
    cap: int | None = 256,
) -> DataFrame:
    """DataFrame [antecedent, consequent, pair_baskets, support,
    confidence, lift] — one row per direction of every 2-itemset whose
    support ≥ ``min_support`` and confidence ≥ ``min_confidence``.

    ``cap`` bounds hub baskets exactly as ``cooccurrence_edges`` (the
    lexicographically-first ``cap`` items participate in pairs; item
    supports stay uncapped — the cap only prunes the quadratic pair side,
    so reported pair support is a lower bound on degenerate mega-baskets
    and exact everywhere a basket fits the cap)."""
    if not (0.0 <= min_support <= 1.0):
        raise ValueError(f"min_support must be in [0, 1], got {min_support}")
    gi = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias("i"))
        .filter(F.col("i").isNotNull())
        .distinct()
    )
    n_b = gi.select("g").distinct().count()
    if n_b == 0:
        raise ValueError("no baskets")
    item = gi.groupBy("i").agg(F.count(F.lit(1)).alias("_ib"))
    if cap is None:
        a, b = gi.alias("a"), gi.alias("b")
        pairs = a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.i") < F.col("b.i"))
        ).select(F.col("a.i").alias("x"), F.col("b.i").alias("y"))
    else:
        rn = F.row_number().over(Window.partitionBy("g").orderBy("i"))
        capped = gi.withColumn("rn", rn).filter(F.col("rn") <= cap)
        a, b = capped.alias("a"), capped.alias("b")
        pairs = a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.rn") < F.col("b.rn"))
        ).select(F.col("a.i").alias("x"), F.col("b.i").alias("y"))
    pc = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("_pb"))
    min_pb = min_support * n_b
    pc = pc.filter(F.col("_pb") >= F.lit(min_pb))
    # both directions from the canonical count
    both = pc.unionByName(
        pc.select(F.col("y").alias("x"), F.col("x").alias("y"), "_pb")
    )
    out = (
        both.join(item.select(F.col("i").alias("x"), F.col("_ib").alias("_xb")), "x")
        .join(item.select(F.col("i").alias("y"), F.col("_ib").alias("_yb")), "y")
        .select(
            F.col("x").alias("antecedent"),
            F.col("y").alias("consequent"),
            F.col("_pb").alias("pair_baskets"),
            (F.col("_pb").cast("double") / n_b).alias("support"),
            (F.col("_pb").cast("double") / F.col("_xb")).alias("confidence"),
            (
                F.col("_pb").cast("double")
                * n_b
                / (F.col("_xb") * F.col("_yb"))
            ).alias("lift"),
        )
    )
    if min_confidence > 0.0:
        out = out.filter(F.col("confidence") >= F.lit(min_confidence))
    return out
