"""streaming_components — incremental CC over an edge stream ==
cold batch CC over the union of all edges seen."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from linkgraph import connected_components
from linkgraph.graph import LinkGraph
from linkgraph.streaming import streaming_components


def _run_stream(spark, batches, max_files_per_trigger=1):
    """Write each batch as one parquet file, stream them in order with
    availableNow + maxFilesPerTrigger=1 so every file is its own
    micro-batch; return the final labels."""
    src = tempfile.mkdtemp(prefix="lg_sc_src_")
    labels = os.path.join(tempfile.mkdtemp(prefix="lg_sc_lab_"), "labels")
    ckpt = tempfile.mkdtemp(prefix="lg_sc_ckpt_")
    try:
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "src string, dst string").coalesce(
                1
            ).write.parquet(f"{src}/b{i}")
        schema = "src string, dst string"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(f"{src}/*")
        )
        q = (
            streaming_components(stream, labels, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not drain"
        return {
            r["id"]: r["component"]
            for r in spark.read.parquet(labels).collect()
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(os.path.dirname(labels), ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _cold(spark, batches):
    allrows = [r for b in batches for r in b]
    g = LinkGraph(
        spark.createDataFrame(allrows, "src string, dst string"),
        keys={"directed": False},
    )
    return {
        r["id"]: r["component"]
        for r in connected_components(g, with_sizes=False).collect()
    }


def test_incremental_equals_cold_batch(spark):
    # batch 1: two separate pairs; batch 2: a bridge merges them and a new
    # isolated pair appears; batch 3: everything merges via one edge
    batches = [
        [("a", "b"), ("x", "y")],
        [("b", "x"), ("p", "q")],
        [("q", "a"), ("m", "n")],
    ]
    assert _run_stream(spark, batches) == _cold(spark, batches)


def test_merge_keeps_min_id_semantics(spark):
    # the second batch merges {m,z} into {a,b}: every member must relabel
    # to 'a' even though m/z never appear in the second batch... except via
    # their shortcut stars
    batches = [[("m", "z")], [("z", "a"), ("a", "b")]]
    out = _run_stream(spark, batches)
    assert out == {"a": "a", "b": "a", "m": "a", "z": "a"}


def test_untouched_components_survive_batches(spark):
    # a singleton-pair component from batch 1 that batch 2 never touches
    batches = [[("s1", "s2")], [("u", "v")]]
    out = _run_stream(spark, batches)
    assert out["s1"] == "s1" and out["s2"] == "s1"
    assert out["u"] == "u" and out["v"] == "u"


def test_single_trigger_over_all_files(spark):
    # same answer when the source delivers everything in one micro-batch
    batches = [
        [("a", "b"), ("x", "y")],
        [("b", "x"), ("p", "q")],
    ]
    out = _run_stream(spark, batches, max_files_per_trigger=10)
    assert out == _cold(spark, batches)
