"""Bow-tie decomposition — planted regions + invariants."""

import pytest
from pyspark.sql import functions as F

from linkgraph import bowtie_decomposition
from linkgraph.graph import LinkGraph

# planted bow-tie: CORE 3-cycle a0->a1->a2->a0; IN i1->a0, i0->i1;
# OUT a2->o1->o2; TUBE i1->t->o1; TENDRIL fromIN i1->x (dead end),
# TENDRIL toOUT y->o1 (from nowhere); OTHER z->x (points into a tendril);
# DISCONNECTED d1->d2
EDGES = [
    ("a0", "a1"), ("a1", "a2"), ("a2", "a0"),
    ("i1", "a0"), ("i0", "i1"),
    ("a2", "o1"), ("o1", "o2"),
    ("i1", "t"), ("t", "o1"),
    ("i1", "x"),
    ("y", "o1"),
    ("z", "x"),
    ("d1", "d2"),
]
EXPECT = {
    "a0": "CORE", "a1": "CORE", "a2": "CORE",
    "i0": "IN", "i1": "IN",
    "o1": "OUT", "o2": "OUT",
    "t": "TUBE",
    "x": "TENDRIL", "y": "TENDRIL",
    "z": "OTHER",
    "d1": "DISCONNECTED", "d2": "DISCONNECTED",
}


def test_planted_bowtie(spark):
    g = LinkGraph(
        spark.createDataFrame(EDGES, "src string, dst string"),
        keys={"directed": True},
    )
    got = {r["id"]: r["region"] for r in bowtie_decomposition(g).collect()}
    assert got == EXPECT


def test_partition_is_total_and_disjoint(spark):
    g = LinkGraph(
        spark.createDataFrame(EDGES, "src string, dst string"),
        keys={"directed": True},
    )
    out = bowtie_decomposition(g)
    assert out.count() == out.select("id").distinct().count() == len(EXPECT)


def test_pure_cycle_is_all_core(spark):
    g = LinkGraph(
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
        ),
        keys={"directed": True},
    )
    got = {r["id"]: r["region"] for r in bowtie_decomposition(g).collect()}
    assert got == {"a": "CORE", "b": "CORE", "c": "CORE"}


def test_chain_around_largest_scc(spark):
    # two 2-cycles joined by a path; the tie on size-2 SCCs breaks to the
    # min-label one ({a,b}) as CORE, making {x,y} part of OUT
    g = LinkGraph(
        spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "x"), ("x", "y"), ("y", "x")],
            "src string, dst string",
        ),
        keys={"directed": True},
    )
    got = {r["id"]: r["region"] for r in bowtie_decomposition(g).collect()}
    assert got == {"a": "CORE", "b": "CORE", "x": "OUT", "y": "OUT"}


def test_isolated_largest_scc_singleton(spark):
    # ADVICE r4 repro: nodes {a, b, c} with the single edge b->c. Every SCC
    # is a singleton; the min-label tiebreak picks 'a' as the core, and 'a'
    # is ISOLATED (no incident edge), so the wcc built from edges alone had
    # no row for it and region labeling raised IndexError.
    g = LinkGraph(
        spark.createDataFrame([("b", "c")], "src string, dst string"),
        nodes=spark.createDataFrame([("a",), ("b",), ("c",)], "id string"),
        keys={"directed": True},
    )
    got = {r["id"]: r["region"] for r in bowtie_decomposition(g).collect()}
    assert got["a"] == "CORE"
    # b and c are in a different weak component than the isolated core
    assert got["b"] == "DISCONNECTED" and got["c"] == "DISCONNECTED"
