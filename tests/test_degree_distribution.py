"""degree_distribution — undirected simple-degree histogram + ccdf."""

import pytest
from pyspark.sql import functions as F

from linkgraph import degree_distribution
from linkgraph.graph import LinkGraph


def _g(spark, rows, nodes=None):
    df = spark.createDataFrame(rows, "src string, dst string")
    if nodes is None:
        return LinkGraph(df, keys={"directed": False})
    nd = spark.createDataFrame([(n,) for n in nodes], "id string")
    return LinkGraph(df, nodes=nd, keys={"directed": False})


def test_distribution_star_with_isolate(spark):
    # star h-s1..s4 plus isolated node z: degrees h=4, s*=1, z=0
    g = _g(
        spark,
        [("h", f"s{i}") for i in range(1, 5)],
        nodes=["h", "s1", "s2", "s3", "s4", "z"],
    )
    rows = {r["degree"]: r for r in degree_distribution(g).collect()}
    assert {k: v["n_nodes"] for k, v in rows.items()} == {4: 1, 1: 4, 0: 1}
    assert rows[4]["ccdf"] == pytest.approx(1 / 6)
    assert rows[1]["ccdf"] == pytest.approx(5 / 6)
    assert rows[0]["ccdf"] == pytest.approx(1.0)


def test_distribution_ignores_direction_loops_and_parallels(spark):
    g = LinkGraph(
        spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "a"), ("a", "b")],
            "src string, dst string",
        ),
        keys={"directed": True},
    )
    rows = {r["degree"]: r["n_nodes"] for r in degree_distribution(g).collect()}
    assert rows == {1: 2}  # single simple undirected edge a-b


def test_total_mass_and_python_free_plan(spark):
    g = _g(spark, [("a", "b"), ("b", "c")])
    out = degree_distribution(g)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert out.agg(F.sum("n_nodes")).collect()[0][0] == 3
