"""Spreading activation exact values (FIXTURES.md F4) and Transition matrix
entries (F5), from the reference's unit tests."""

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph
from linkgraph.algorithms.spread_activation import spread_activation
from linkgraph.algorithms.transition import transition_matrix, transition_power

F4_EDGES = [("A", "B", 5.0), ("A", "C", 2.0), ("B", "E", 8.0), ("C", "A", 1.0),
            ("D", "A", 8.0), ("D", "C", 2.0), ("E", "F", 3.0)]


@pytest.fixture(scope="module")
def f4(spark):
    df = spark.createDataFrame(F4_EDGES, ["src", "dst", "weight"])
    nodes = spark.createDataFrame([(x,) for x in "ABCDEF"], ["id"])
    return LinkGraph(df, nodes=nodes)


def _inf(df):
    return {r["id"]: r["influence"] for r in df.collect()}


def test_spread_unweighted_one_step(spark, f4):
    # reference test_ml_spark_spreadactivation.py:102-104
    got = _inf(spread_activation(f4, ["D"], 0.2, "unweighted", steps=1))
    assert got["D"] == pytest.approx(0.8)
    assert got["C"] == pytest.approx(0.1)
    assert got["A"] == pytest.approx(0.1)
    assert got["B"] == 0.0 and got["E"] == 0.0 and got["F"] == 0.0


def test_spread_weighted_one_step(spark, f4):
    # reference :119-125
    got = _inf(spread_activation(f4, ["D"], 0.2, "weighted", steps=1))
    assert got["D"] == pytest.approx(0.8)
    assert got["C"] == pytest.approx(0.04)
    assert got["A"] == pytest.approx(0.16)


def test_spread_mass_conservation_two_steps(spark, f4):
    # reference :55-66 — seeds {C, D}, 2 steps: total influence stays 2.0,
    # influence reaches {A, B, C, D} only
    res = spread_activation(f4, ["C", "D"], 0.2, "weighted", steps=2)
    got = _inf(res)
    assert sum(got.values()) == pytest.approx(2.0)
    assert {k for k, v in got.items() if v > 0} == {"A", "B", "C", "D"}


def test_spread_influenced_by(spark, f4):
    res = spread_activation(f4, ["C", "D"], 0.2, "weighted", steps=2,
                            influenced_by=True)
    prov = {r["id"]: set(r["influenced_by"]) for r in res.collect()}
    assert prov["D"] == {"D"}
    assert "C" in prov["A"] and "D" in prov["A"]


F5_EDGES = [("Madrid", "Bilbao", 50.0), ("Madrid", "Barcelona", 50.0),
            ("Bilbao", "Santander", 25.0), ("Bilbao", "Algorta", 75.0),
            ("Barcelona", "Reus", 25.0), ("Barcelona", "Andorra", 75.0)]


@pytest.fixture(scope="module")
def f5(spark):
    df = spark.createDataFrame(F5_EDGES, ["src", "dst", "weight"])
    return LinkGraph(df)


def _m(df):
    return {(r["src"], r["dst"]): r["prob"] for r in df.collect()}


def test_transition_rows_sum_to_one(spark, f5):
    tm = transition_matrix(f5)
    sums = tm.groupBy("src").agg(F.sum("prob").alias("s")).collect()
    for r in sums:
        assert r["s"] == pytest.approx(1.0)


def test_transition_entries(spark, f5):
    # reference test_ml_transition.py:62-127
    t1 = _m(transition_matrix(f5))
    assert t1[("Madrid", "Bilbao")] == pytest.approx(0.5)
    assert t1[("Santander", "Santander")] == 1.0  # dangling → recurrent

    tm = transition_matrix(f5)
    t2 = _m(transition_power(tm, 2))
    assert t2[("Madrid", "Algorta")] == pytest.approx(0.375)
    assert t2[("Madrid", "Reus")] == pytest.approx(0.125)

    t2000 = _m(transition_power(tm, 2000))
    assert t2000[("Madrid", "Algorta")] == pytest.approx(0.375)
    assert t2000[("Madrid", "Reus")] == pytest.approx(0.125)
