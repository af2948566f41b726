"""Structured Streaming operators for incremental link-graph maintenance.

The reference has NO streaming surface (verified: no readStream/writeStream
under ``mercury/``, SURVEY.md §2.10) — its iteration is batch supersteps.
This module adds the streaming counterparts a continuously-ingested corpus
needs, as Structured Streaming dataflows:

- ``edges_from_event_stream``   — map an event stream to timestamped edges
- ``windowed_degrees``          — event-time windowed degree counts with a
                                  watermark for late data
- ``running_degrees``           — exact running per-node degree via
                                  ``applyInPandasWithState`` (custom stateful
                                  operator, Arrow-batched)

All are plain streaming DataFrames: sink/trigger/checkpointLocation are the
caller's choice (tests use availableNow + memory sink).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def edges_from_event_stream(
    events: DataFrame,
    src_col: str = "user_id",
    dst_col: str = "event_type",
    ts_col: str = "ts",
    weight_col: str | None = "value",
) -> DataFrame:
    """Canonicalize a streaming event table to (src, dst, ts[, weight])."""
    cols = [
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
        # watermarks require TIMESTAMP; parquet often carries TIMESTAMP_NTZ
        F.col(ts_col).cast("timestamp").alias("ts"),
    ]
    if weight_col:
        cols.append(F.col(weight_col).cast("double").alias("weight"))
    return events.select(*cols)


def windowed_degrees(
    edge_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Event-time windowed degree per node (both endpoints), late data
    bounded by the watermark. Output: (window, id, degree) in append mode
    once the watermark passes."""
    ends = edge_stream.select(F.col("src").alias("id"), "ts").unionByName(
        edge_stream.select(F.col("dst").alias("id"), "ts")
    )
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        ends.withWatermark("ts", watermark)
        .groupBy(w.alias("window"), "id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


_RUN_STATE = StructType([StructField("degree", LongType())])
_RUN_OUT = StructType(
    [StructField("id", StringType()), StructField("degree", LongType())]
)


def running_degrees(edge_stream: DataFrame) -> DataFrame:
    """Exact running degree per node across all micro-batches — a custom
    stateful operator in ``applyInPandasWithState`` (Arrow batches, state =
    one long per node). Emits the updated total for every node touched in
    the batch (update semantics)."""

    def update(key, pdfs, state: GroupState):
        add = 0
        for pdf in pdfs:
            add += len(pdf)
        prev = state.get[0] if state.exists else 0
        total = prev + add
        state.update((total,))
        yield pd.DataFrame({"id": [key[0]], "degree": [total]})

    ends = edge_stream.select(F.col("src").alias("id")).unionByName(
        edge_stream.select(F.col("dst").alias("id"))
    )
    return ends.groupBy("id").applyInPandasWithState(
        update,
        outputStructType=_RUN_OUT,
        stateStructType=_RUN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    doc_stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming exact dedup over a document stream — the incremental
    counterpart of ``pipeline.dedup.exact_dedup``, sharing its md5
    whitespace-normalized fingerprint (``pipeline.text.doc_fingerprint``).

    State per fingerprint = (running copy count, min id seen); every
    micro-batch emits the updated (fingerprint, n_copies, keeper) row
    (update mode). Because both pieces of state are order-insensitive folds
    (sum, min), the FINAL state is independent of micro-batch boundaries and
    equals the batch ``exact_dedup`` result exactly — including the keeper:
    integral ids keep numeric min (state typed long); other id types compare
    as strings. Only (fingerprint, id) enters the Arrow stateful stage — the
    text column is dropped right after fingerprinting, so the corpus body is
    never shipped to the Python workers.
    """
    from pyspark.sql.types import IntegralType

    from linkgraph.pipeline.text import doc_fingerprint

    numeric_id = isinstance(doc_stream.schema[id_col].dataType, IntegralType)
    id_t = LongType() if numeric_id else StringType()
    state_schema = StructType(
        [StructField("n", LongType()), StructField("keeper", id_t)]
    )
    out_schema = StructType(
        [
            StructField("fingerprint", StringType()),
            StructField("n_copies", LongType()),
            StructField("keeper", id_t),
        ]
    )
    fp = doc_fingerprint(
        doc_stream.select(
            F.col(id_col).cast("long" if numeric_id else "string").alias("_id"),
            F.col(text_col).alias("_t"),
        ),
        "_t",
    ).select("fingerprint", "_id")

    def update(key, pdfs, state: GroupState):
        n_add, mn = 0, None
        for pdf in pdfs:
            n_add += len(pdf)
            # dropna: Arrow hands pandas a float64 _id when nulls are
            # present (numeric path), and .min() over an all-null group
            # would return NaN — which neither LongType state nor the
            # batch exact_dedup keeper (F.min skips nulls) would accept
            ids = pdf["_id"].dropna()
            if len(ids):
                m = ids.min()
                mn = m if mn is None else min(mn, m)
        if numeric_id and mn is not None:
            mn = int(mn)  # float64 under nulls; state column is LongType
        if state.exists:
            n0, k0 = state.get
            n = n0 + n_add
            k = mn if k0 is None else (k0 if mn is None else min(k0, mn))
        else:
            n, k = n_add, mn
        state.update((n, k))
        yield pd.DataFrame(
            {"fingerprint": [key[0]], "n_copies": [n], "keeper": [k]}
        )

    return fp.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key session aggregates via Spark's native ``session_window`` —
    JVM-side session state, identical code for BATCH and STREAMING input
    (on a stream, add the watermark and emit in append mode once sessions
    close). Output: (key…, session_start, session_end, n_events).

    Boundary semantics are session_window's: an event EXTENDS the session
    while ``ts < previous ts + gap`` (an event exactly at the gap starts a
    NEW session) — the complement of :func:`linkgraph.pipeline.temporal.
    sessionize`'s strict-greater break, pinned by the oracle's ``>=``
    replay. Use this form when you want per-session rollups and
    streaming-compatibility; use ``sessionize`` when every event row needs
    its session id."""
    key_cols = key_cols or ["user_id"]
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("sw"), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_components(
    edge_stream: DataFrame,
    labels_path: str,
    checkpoint_path: str,
    max_iter: int = 50,
):
    """Incremental connected components over an edge stream: a
    ``foreachBatch`` sink that folds each micro-batch of NEW edges into a
    maintained label table (parquet at ``labels_path``) through
    ``connected_components(initial_labels=...)`` — every labeled node
    carries a virtual shortcut to its old representative, so each batch
    pays two-star rounds only for what its edges MERGE, never for
    re-solving history. State is the n-node label table, not the edge
    history — the only incremental-CC design that survives an unbounded
    stream. Additive streams only (the warm start's documented contract:
    deletions can split components and must trigger a cold re-run).

    Labels after any prefix of batches are IDENTICAL to a cold batch run
    over the union of those batches' edges (min-id per component), which
    is what makes the operator oracle-checkable.

    State durability: each batch writes the new label table to a staging
    directory and promotes it with a filesystem rename, and a committed
    marker (``labels_path + "._lg_committed"``) records that state has
    ever existed — so an unreadable/missing label table AFTER the first
    commit raises instead of silently re-solving from one batch's edges
    (which would discard every previously accumulated component). The
    fold itself is idempotent (re-folding a batch whose edges are already
    in the labels yields the same labels), so foreachBatch retries after
    a loud failure are safe once the state is restored.

    Edge columns: ``src``/``dst`` by name when present; otherwise a
    two-column batch is read positionally; anything else raises (a
    reordered upstream must not silently build a wrong graph).

    Returns the configured ``DataStreamWriter`` — the caller picks the
    trigger and calls ``.start()``; read ``labels_path`` between or after
    triggers."""
    from pyspark.errors import AnalysisException

    from linkgraph.algorithms.components import connected_components
    from linkgraph.graph import LinkGraph

    marker = labels_path.rstrip("/") + "._lg_committed"
    staging = labels_path.rstrip("/") + "._staging"

    def _hfs(spark, path):
        # the session's Hadoop filesystem — labels live wherever the
        # cluster writes (HDFS/S3/local alike), so os.path is wrong here
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm

    def fold(batch_df, batch_id):
        spark = batch_df.sparkSession
        cols = batch_df.columns
        if "src" in cols and "dst" in cols:
            edges = batch_df.select("src", "dst")
        elif len(cols) == 2:
            edges = batch_df.select(
                F.col(cols[0]).alias("src"), F.col(cols[1]).alias("dst")
            )
        else:
            raise ValueError(
                "streaming_components needs src/dst columns (by name) or "
                f"an exactly-two-column edge batch; got {cols}"
            )
        prev = None
        ends = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        try:
            prev = spark.read.parquet(labels_path).select("id", "component")
            prev.schema  # force analysis so a missing path raises HERE
        except AnalysisException:
            fs, mp, _ = _hfs(spark, marker)
            if fs.exists(mp):
                # state has been committed before but is now unreadable —
                # a silent prev=None here would fold history away into a
                # single-batch solve; surface it instead
                raise RuntimeError(
                    f"label state at {labels_path!r} is committed (marker "
                    "present) but unreadable; restore it (a crashed "
                    "promote leaves it at the ._staging path) or delete "
                    "both the labels and the ._lg_committed marker to "
                    "cold-start"
                )
            prev = None
        if prev is not None:
            # the solve's node set must be batch ∪ history: CC emits labels
            # only for its node table, and a history node absent from this
            # batch still RELABELS when the batch merges its component —
            # restricting to batch nodes would freeze it at a stale rep
            ends = ends.unionByName(prev.select("id")).distinct()
        g = LinkGraph(edges, nodes=ends, keys={"directed": False})
        labels = connected_components(
            g, max_iter=max_iter, with_sizes=False, initial_labels=prev
        )
        out = labels.localCheckpoint(eager=True)  # sever lineage before write
        # stage-then-promote: the live labels dir is never a PARTIAL write.
        # Known reader-side transient (ADVICE r5): between fs.delete(live)
        # and fs.rename(staging, live) the live path does not exist — and on
        # object stores without atomic rename the window is the copy time —
        # so a concurrent reader between triggers must retry on
        # FileNotFound (or read the committed marker first). Crash-loss
        # inside the window is loud, not silent: the marker is only written
        # after the rename lands.
        out.write.mode("overwrite").parquet(staging)
        fs, lp, jvm = _hfs(spark, labels_path)
        sp = jvm.org.apache.hadoop.fs.Path(staging)
        fs.delete(lp, True)
        fs.rename(sp, lp)
        fs.createNewFile(jvm.org.apache.hadoop.fs.Path(marker))

    return (
        edge_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
