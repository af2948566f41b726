

def test_temperature_sample_null_group_participates(spark):
    from linkgraph.pipeline.sampling import temperature_sample

    rows = [(f"d{i}", "g1") for i in range(200)] + [
        (f"n{i}", None) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    out = temperature_sample(df, 200, "grp", ["doc_id"], alpha=1.0)
    got = out.groupBy("grp").count().collect()
    by = {r["grp"]: r["count"] for r in got}
    # the NULL group must be sampled (~100 rows), not silently dropped
    assert by.get(None, 0) > 50
    assert by.get("g1", 0) > 50


def test_bucket_distinguishes_null_key_positions(spark):
    from pyspark.sql import functions as F

    from linkgraph.pipeline.sampling import _bucket

    df = spark.createDataFrame(
        [("x", None), (None, "x")], ["a", "b"]
    )
    vals = [
        r["h"] for r in df.select(_bucket(["a", "b"], 7).alias("h")).collect()
    ]
    # concat_ws used to SKIP nulls, hashing both rows identically
    assert vals[0] != vals[1]
