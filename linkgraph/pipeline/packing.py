"""Sequence packing — assign documents to fixed-token-budget packs.

Beyond the reference (no training-data utilities in ``mercury/graph``);
LLM pre-training consumes documents as fixed-size token streams, and the
packing step — "which documents share a training sequence" — must be
DETERMINISTIC (reshuffling packs between the tokenizer run and the
trainer run silently changes every batch boundary).

Semantics: offset binning. Within each partition-key group, documents are
ordered by ``order_col`` and concatenated conceptually; a document's pack
is the budget-span its START offset falls in::

    pack(d) = floor(start_offset(d) / budget),  start_offset = cumsum − len

A document longer than ``budget`` simply spans several budget windows —
its successor starts in a later pack automatically (the cumsum carries
through), so oversize inputs need no special casing; consumers that chunk
packs into exact ``budget``-token windows get the standard
concat-and-chunk layout.

Scale shape: packing is inherently sequential WITHIN a stream, so the
parallelism unit is the partition key (``part_cols``) — one running-sum
window per group, ordered and deterministic. Pick part_cols with enough
distinct values to spread the load (language, source shard, hash bucket);
the per-group scan is the irreducible sequential part of packing, not an
engine artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str,
    order_col: str,
    part_cols: list[str],
    out: str = "pack",
) -> DataFrame:
    """Append ``out``: the 0-based pack index of each row within its
    ``part_cols`` group (packs are LOCAL to the group — the global pack key
    is ``part_cols + [out]``). Deterministic given the data: ordering is
    (``order_col``) within each group, assignment is offset binning."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if not part_cols:
        raise ValueError(
            "part_cols must be non-empty — a global pack stream serializes "
            "the whole dataset through one task; give packing a partition "
            "key (language, source shard, hash bucket)"
        )
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)
    return df.withColumn(out, F.floor(start / F.lit(budget)))


def pack_token_totals(
    packed: DataFrame,
    tokens_col: str,
    part_cols: list[str],
    pack_col: str = "pack",
) -> DataFrame:
    """Per-pack token totals + document counts — the sanity view a pipeline
    materializes next to the packed table (every total ≤ budget + the
    straddling document's overhang)."""
    return packed.groupBy(*part_cols, pack_col).agg(
        F.sum(tokens_col).alias("pack_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
