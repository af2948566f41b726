"""Topological layers: longest-path levels, cycle detection, nx parity."""

import networkx as nx
import pytest

from linkgraph import LinkGraph, topological_layers
from tests.fixtures import random_digraph


def test_layers_longest_path_not_bfs(spark):
    # path a->b->c->d plus skip edges a->c, b->d: longest-path layers are
    # 0,1,2,3 (a BFS/shortest implementation would say 0,1,1,2)
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = {r["id"]: r["layer"] for r in topological_layers(g).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_layers_networkx_parity_random_dag(spark):
    # orient random edges low->high: guaranteed DAG
    edges = [(s, d) for s, d, _ in random_digraph(50, 0.08, seed=3) if s < d]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = {r["id"]: r["layer"] for r in topological_layers(g).collect()}
    ng = nx.DiGraph(edges)
    ref = {n: 0 for n in ng}
    for n in nx.topological_sort(ng):
        for _, v in ng.out_edges(n):
            ref[v] = max(ref[v], ref[n] + 1)
    assert got == ref


def test_layers_cycle_raises(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    with pytest.raises(ValueError, match="not a DAG"):
        topological_layers(g)


def test_layers_max_depth_budget(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert topological_layers(g, max_depth=3).count() == 4
    with pytest.raises(ValueError, match="max_depth"):
        topological_layers(g, max_depth=1)


def test_layers_undirected_rejected(spark):
    g = LinkGraph(
        spark.createDataFrame([("a", "b")], ["src", "dst"]),
        keys={"directed": False},
    )
    with pytest.raises(ValueError, match="directed"):
        topological_layers(g)


def test_layers_isolated_nodes_are_sources(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    nodes = spark.createDataFrame([("a",), ("b",), ("iso",)], ["id"])
    g = LinkGraph(edges, nodes=nodes)
    got = {r["id"]: r["layer"] for r in topological_layers(g).collect()}
    assert got == {"a": 0, "b": 1, "iso": 0}
