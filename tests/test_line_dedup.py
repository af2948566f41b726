"""Cross-document line-level dedup (pipeline/dedup.py:drop_duplicate_lines)
— the CCNet/RefinedWeb boilerplate-removal transform."""

import pytest

from linkgraph.pipeline.dedup import drop_duplicate_lines


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_boilerplate_removed_order_preserved(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique alpha\ncookie banner\nunique beta"),
            (2, "cookie banner\nsecond body"),
            (3, "third body\ncookie banner"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(drop_duplicate_lines(docs, min_docs=2))
    assert out[1]["text"] == "unique alpha\nunique beta"
    assert out[2]["text"] == "second body"
    assert out[3]["text"] == "third body"
    assert out[1]["n_lines"] == 3 and out[1]["n_dropped"] == 1


def test_min_docs_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "shared twice\na"), (2, "shared twice\nb"), (3, "c")],
        ["doc_id", "text"],
    )
    kept = _rows(drop_duplicate_lines(docs, min_docs=3))
    assert kept[1]["text"] == "shared twice\na"  # only 2 docs share it
    dropped = _rows(drop_duplicate_lines(docs, min_docs=2))
    assert dropped[1]["text"] == "a"


def test_within_doc_repeat_is_not_boilerplate(spark):
    # the SAME doc repeating a line twice is repetition, not cross-doc
    # boilerplate — distinct-doc counting must not remove it
    docs = spark.createDataFrame(
        [(1, "echo\necho\nbody"), (2, "other")], ["doc_id", "text"]
    )
    out = _rows(drop_duplicate_lines(docs, min_docs=2))
    assert out[1]["text"] == "echo\necho\nbody"


def test_empty_and_short_lines_immune(spark):
    docs = spark.createDataFrame(
        [(1, "a\n\nbody one"), (2, "a\n\nbody two")], ["doc_id", "text"]
    )
    out = _rows(drop_duplicate_lines(docs, min_docs=2, min_chars=2))
    # blank line shared by both docs survives; 1-char 'a' is under min_chars
    assert out[1]["text"] == "a\n\nbody one"
    out2 = _rows(drop_duplicate_lines(docs, min_docs=2, min_chars=1))
    assert out2[1]["text"] == "\nbody one"  # 'a' now removable, blank stays


def test_whitespace_normalized_matching(spark):
    docs = spark.createDataFrame(
        [(1, "  footer text \nkeep1"), (2, "footer text\nkeep2")],
        ["doc_id", "text"],
    )
    out = _rows(drop_duplicate_lines(docs, min_docs=2))
    assert out[1]["text"] == "keep1" and out[2]["text"] == "keep2"


def test_fully_boilerplate_doc_becomes_empty(spark):
    docs = spark.createDataFrame(
        [(1, "nav"), (2, "nav"), (3, "nav\nreal content")],
        ["doc_id", "text"],
    )
    out = _rows(drop_duplicate_lines(docs, min_docs=2))
    assert out[1]["text"] == "" and out[1]["n_dropped"] == 1
    assert out[3]["text"] == "real content"


def test_validation(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="min_docs"):
        drop_duplicate_lines(docs, min_docs=1)


def test_plan_no_python_no_window(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc")], ["doc_id", "text"]
    )
    plan = (
        drop_duplicate_lines(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "Window" not in plan.replace("WindowGroupLimit", "")


def test_null_text_doc_survives(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc"), (3, None)], schema
    )
    out = _rows(drop_duplicate_lines(docs, min_docs=2))
    assert set(out) == {1, 2, 3}
    assert out[3]["text"] is None
    assert out[3]["n_lines"] == 0 and out[3]["n_dropped"] == 0
