"""Structured Streaming operators (availableNow + memory sink) and skew
utilities (salted two-phase agg, hub splitting)."""

import time

import pytest
from pyspark.sql import functions as F

from linkgraph.skew import split_hubs, two_phase_sum
from linkgraph.streaming import (
    edges_from_event_stream,
    running_degrees,
    windowed_degrees,
)


def _run_stream(q_df, name, mode):
    q = (
        q_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


@pytest.fixture(scope="module")
def edge_stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    rows = [
        (1, "click", "2024-01-01 10:05:00", 1.0),
        (1, "view", "2024-01-01 10:15:00", 1.0),
        (2, "click", "2024-01-01 10:20:00", 1.0),
        (1, "click", "2024-01-01 11:05:00", 1.0),
        (3, "buy", "2024-01-01 11:30:00", 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_s", "value"])
    df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _read_stream(spark, d):
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).parquet(d)


def test_windowed_degrees(spark, edge_stream_dir):
    es = edges_from_event_stream(_read_stream(spark, edge_stream_dir))
    deg = windowed_degrees(es, window="1 hour", watermark="5 minutes")
    # complete mode: append only emits a window after a LATER batch advances
    # the watermark past it; availableNow ends before that happens
    _run_stream(deg, "win_deg", "complete")
    rows = spark.sql("SELECT * FROM win_deg").collect()
    got = {(r["window"]["start"].hour, r["id"]): r["degree"] for r in rows}
    # hour 10: user 1 x2, user 2 x1, click x2, view x1; hour 11: 1, 3, click, buy
    assert got[(10, "1")] == 2
    assert got[(10, "click")] == 2
    assert got[(11, "1")] == 1
    assert got[(11, "buy")] == 1


def test_running_degrees_stateful(spark, edge_stream_dir):
    es = edges_from_event_stream(_read_stream(spark, edge_stream_dir))
    run = running_degrees(es)
    _run_stream(run, "run_deg", "update")
    rows = spark.sql("SELECT * FROM run_deg").collect()
    got = {r["id"]: r["degree"] for r in rows}
    assert got["1"] == 3
    assert got["click"] == 3
    assert got["3"] == 1


def test_two_phase_sum_matches_plain(spark):
    df = spark.createDataFrame(
        [("k1", float(i % 7)) for i in range(200)] + [("k2", 1.0)] * 50,
        ["k", "v"],
    )
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["s"] for r in two_phase_sum(df, "k", "v", "s", buckets=8).collect()}
    assert salted == plain


def test_split_hubs(spark):
    rows = [("hub", f"d{i}") for i in range(500)] + [("small", "x")]
    df = spark.createDataFrame(rows, ["src", "dst"])
    out = split_hubs(df, "src", degree_threshold=100, buckets=8)
    assert out.count() == 501
    hub_salts = out.filter("src = 'hub'").select("_salt").distinct().count()
    small_salts = out.filter("src = 'small'").select("_salt").distinct().collect()
    assert hub_salts > 1  # hub rows spread over buckets
    assert small_salts[0][0] == 0  # non-hub keeps salt 0


def test_dedup_stream_matches_batch_across_batches(spark, tmp_path):
    """Final dedup state must be independent of micro-batch boundaries:
    two parquet files replayed one-file-per-trigger give the same
    (fingerprint, n_copies, keeper) as the batch exact grouping."""
    from linkgraph.streaming import dedup_stream

    d = str(tmp_path / "docs_in")
    # ids 11/9 share a text: numeric min must yield 9 (lexicographic string
    # min would wrongly yield "11") — keeper stays type-faithful
    rows1 = [(10, "Hello  world"), (11, "unique one"), (5, "hello world")]
    rows2 = [(1, "hello   WORLD"), (7, "unique two"), (9, "unique one")]
    spark.createDataFrame(rows1, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    spark.createDataFrame(rows2, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    schema = spark.read.parquet(d).schema
    ds = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        dedup_stream(ds)
        .writeStream.format("memory")
        .queryName("dd_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {
        r["fingerprint"]: (r["n_copies"], r["keeper"])
        for r in spark.sql(
            "SELECT fingerprint, max(n_copies) AS n_copies, min(keeper) AS keeper "
            "FROM dd_test GROUP BY fingerprint"
        ).collect()
    }
    from linkgraph.pipeline.text import doc_fingerprint

    batch = spark.createDataFrame(rows1 + rows2, ["doc_id", "text"])
    expected = {
        r["fingerprint"]: (r["n"], r["k"])
        for r in doc_fingerprint(batch)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("k"),
        )
        .collect()
    }
    assert final == expected
    # the three "hello world" variants normalize to one fingerprint, count 3
    assert (3, 1) in final.values()
    # numeric keeper: {11, 9} -> 9, where a string min would have said "11"
    assert (2, 9) in final.values()


def test_session_stats_batch_and_stream_agree(spark, edge_stream_dir):
    from linkgraph.streaming import session_stats

    batch = spark.read.parquet(edge_stream_dir)
    want = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in session_stats(batch, gap="30 minutes").collect()
    }
    # user 1: 10:05+10:15 one session (gap 10m), 11:05 a new one; users 2,3
    # single-event sessions; session_end = last ts + gap
    import datetime as dt

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    assert want == {
        (1, t(10, 5), t(10, 45)): 2,
        (1, t(11, 5), t(11, 35)): 1,
        (2, t(10, 20), t(10, 50)): 1,
        (3, t(11, 30), t(12, 0)): 1,
    }
    stream = session_stats(
        _read_stream(spark, edge_stream_dir), gap="30 minutes",
        watermark="1 minute",
    )
    _run_stream(stream, "sess_stats", "complete")
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.sql("SELECT * FROM sess_stats").collect()
    }
    assert got == want


def test_dedup_stream_null_ids(spark, tmp_path):
    """Null ids must not poison the keeper state: Arrow hands pandas a
    float64 id column when nulls are present, and an all-null group's
    min() is NaN — the kernel drops nulls (matching batch F.min) and
    casts the keeper back to int for LongType state (round-5 review)."""
    from pyspark.sql import types as T

    from linkgraph.streaming import dedup_stream

    d = str(tmp_path / "docs_null")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows1 = [(None, "shared text"), (7, "shared text"), (None, "orphan")]
    rows2 = [(3, "shared text")]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    ds = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        dedup_stream(ds)
        .writeStream.format("memory")
        .queryName("dd_null_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain"
    final = {
        r["fingerprint"]: (r["n_copies"], r["keeper"])
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY fingerprint ORDER BY n_copies DESC) rn "
            "FROM dd_null_test) WHERE rn = 1"
        ).collect()
    }
    by_text = {}
    from linkgraph.pipeline.text import doc_fingerprint

    fps = doc_fingerprint(
        spark.createDataFrame(
            [("shared text",), ("orphan",)], ["text"]
        ),
        "text",
    ).collect()
    for r in fps:
        by_text[r["text"]] = r["fingerprint"]
    # shared text: 3 copies (one null id), keeper = min(7, 3) = 3
    assert final[by_text["shared text"]] == (3, 3)
    # orphan: only a null id — counted, keeper stays NULL
    assert final[by_text["orphan"]] == (1, None)
