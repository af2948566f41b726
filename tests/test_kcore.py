"""k-core / core_number parity vs networkx, plus plan shape."""

import networkx as nx
import pytest

from linkgraph import LinkGraph, core_number, k_core
from tests.fixtures import random_digraph


def _nx_graph(edges):
    g = nx.Graph()
    g.add_edges_from((s, d) for s, d, *_ in edges if s != d)
    return g


def test_k_core_clique_plus_tail(spark):
    # K5 clique (core 4) with a 3-node tail hanging off (core 1)
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    tail = [("c0", "t1"), ("t1", "t2"), ("t2", "t3")]
    g = LinkGraph(spark.createDataFrame(clique + tail, ["src", "dst"]))
    assert sorted(r["id"] for r in k_core(g, 2).collect()) == sorted(
        f"c{i}" for i in range(5)
    )
    assert sorted(r["id"] for r in k_core(g, 4).collect()) == sorted(
        f"c{i}" for i in range(5)
    )
    assert k_core(g, 5).count() == 0
    # k=1 keeps every non-isolated node; k=0 keeps all nodes
    assert k_core(g, 1).count() == 8
    assert k_core(g, 0).count() == 8


def test_core_number_networkx_parity(spark):
    edges = random_digraph(60, 0.07, seed=11)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    got = {r["id"]: r["core"] for r in core_number(g).collect()}
    ref = nx.core_number(_nx_graph(edges))
    assert got == ref


def test_core_number_isolated_nodes(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("iso",)], ["id"])
    g = LinkGraph(edges, nodes=nodes)
    got = {r["id"]: r["core"] for r in core_number(g).collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "iso": 0}


def test_k_core_validation(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError):
        k_core(g, -1)
