"""Truss decomposition — networkx k_truss peeling parity."""

import itertools
import random

import pytest

from linkgraph import LinkGraph, truss_decomposition

nx = pytest.importorskip("networkx")


def _expected(edges):
    G = nx.Graph(edges)
    exp, k = {}, 2
    remaining = {(min(a, b), max(a, b)) for a, b in G.edges()}
    while remaining:
        k += 1
        ek = {
            (min(a, b), max(a, b)) for a, b in nx.k_truss(G, k).edges()
        }
        for e in remaining - ek:
            exp[e] = k - 1
        remaining = ek
    return exp


def _got(spark, edges):
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    return {
        (r["src"], r["dst"]): r["trussness"]
        for r in truss_decomposition(g).collect()
    }


def test_k5_tail_k4(spark):
    edges = [(f"a{i}", f"a{j}") for i, j in itertools.combinations(range(5), 2)]
    edges += [("a0", "t1"), ("t1", "t2")]
    edges += [
        (x, y) for x, y in itertools.combinations(["a0", "b1", "b2", "b3"], 2)
    ]
    assert _got(spark, edges) == _expected(edges)


def test_triangle_chain(spark):
    # two triangles sharing an edge: shared edge support 2 -> all truss 4?
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("c", "d")]
    assert _got(spark, edges) == _expected(edges)


def test_forest_all_two(spark):
    edges = [("1", "2"), ("2", "3"), ("4", "5")]
    got = _got(spark, edges)
    assert got == {("1", "2"): 2, ("2", "3"): 2, ("4", "5"): 2}


def test_empty_graph(spark):
    nodes = spark.createDataFrame([("a",)], ["id"])
    e = spark.createDataFrame([], "src string, dst string")
    g = LinkGraph(e, nodes=nodes)
    assert truss_decomposition(g).count() == 0


def test_random_matches_networkx(spark):
    random.seed(23)
    nodes = [f"v{i}" for i in range(16)]
    edges = sorted(
        {(a, b) for a in nodes for b in nodes if a < b and random.random() < 0.3}
    )
    assert _got(spark, edges) == _expected(edges)
