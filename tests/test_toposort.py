"""Topological layers: longest-path levels, cycle detection, nx parity."""

import networkx as nx
import pytest

from linkgraph import LinkGraph, critical_path, topological_layers
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


# ------------------------------------------------------------ critical path


def _dur_df(spark, durs):
    return spark.createDataFrame(list(durs.items()), ["id", "duration"])


def test_critical_path_hand_case(spark):
    # a(3) -> b(2) -> d(4), a -> c(7) -> d: ef(d) = 4 + max(5, 10) = 14,
    # and the binding predecessor is c
    edges = [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    out = critical_path(g, _dur_df(spark, {"a": 3, "b": 2, "c": 7, "d": 4}))
    got = {r["id"]: (r["earliest_finish"], r["critical_pred"]) for r in out.collect()}
    assert got == {
        "a": (3.0, None),
        "b": (5.0, "a"),
        "c": (10.0, "a"),
        "d": (14.0, "c"),
    }


def test_critical_path_networkx_parity_random_dag(spark):
    edges = [(s, d) for s, d, _ in random_digraph(60, 0.07, seed=9) if s < d]
    nodes = sorted({x for e in edges for x in e})
    durs = {n: (n * 7) % 13 + 1 for n in nodes}
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    out = critical_path(g, _dur_df(spark, durs))
    got = {r["id"]: r["earliest_finish"] for r in out.collect()}
    ng = nx.DiGraph(edges)
    ng.add_nodes_from(nodes)
    ref = {n: float(durs[n]) for n in ng}
    for n in nx.topological_sort(ng):
        for _, v in ng.out_edges(n):
            ref[v] = max(ref[v], ref[n] + durs[v])
    assert got == ref
    # pred invariant: ef(v) == ef(pred) + dur(v), pred is min-id argmax
    preds = {r["id"]: r["critical_pred"] for r in out.collect()}
    for v, p in preds.items():
        ins = list(ng.in_edges(v))
        if not ins:
            assert p is None
            continue
        best = max(ref[u] for u, _ in ins)
        assert ref[v] == best + durs[v]
        assert p == min(u for u, _ in ins if ref[u] == best)


def test_critical_path_missing_duration_defaults_zero(spark):
    edges = [("a", "b")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    out = critical_path(g, _dur_df(spark, {"a": 5}))
    got = {r["id"]: r["earliest_finish"] for r in out.collect()}
    assert got == {"a": 5.0, "b": 5.0}


def test_critical_path_negative_duration_rejected(spark):
    edges = [("a", "b")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    with pytest.raises(ValueError, match="non-negative"):
        critical_path(g, _dur_df(spark, {"a": -1, "b": 2}))


def test_critical_path_cycle_raises(spark):
    edges = [("a", "b"), ("b", "a")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    with pytest.raises(ValueError, match="still improving"):
        critical_path(g, _dur_df(spark, {"a": 1, "b": 1}))
