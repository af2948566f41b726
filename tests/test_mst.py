"""Minimum spanning forest: networkx parity, ties, forests, parallel edges."""

import random

import networkx as nx
import pytest

from linkgraph import LinkGraph, minimum_spanning_forest, minimum_spanning_weight


def _nx_mst_weight(edges):
    g = nx.Graph()
    for s, d, w in edges:
        if g.has_edge(s, d):
            g[s][d]["weight"] = min(g[s][d]["weight"], w)
        else:
            g.add_edge(s, d, weight=w)
    return sum(
        d["weight"]
        for _, _, d in nx.minimum_spanning_edges(g, algorithm="boruvka", data=True)
    )


def _assert_valid_spanning_forest(got, edges):
    """got must be acyclic, span every component, and use only input edges."""
    g = nx.Graph()
    for s, d, w in edges:
        if g.has_edge(s, d):
            g[s][d]["weight"] = min(g[s][d]["weight"], w)
        else:
            g.add_edge(s, d, weight=w)
    f = nx.Graph()
    f.add_nodes_from(g)
    for s, d, w in got:
        assert g.has_edge(s, d) and abs(g[s][d]["weight"] - w) < 1e-12
        f.add_edge(s, d)
    assert nx.is_forest(f)
    assert nx.number_connected_components(f) == nx.number_connected_components(g)


def test_mst_distinct_weights_exact_edge_set(spark):
    rng = random.Random(7)
    n = 40
    pool = [(f"n{i:02d}", f"n{j:02d}") for i in range(n) for j in range(i + 1, n)]
    chosen = rng.sample(pool, 150)
    weights = rng.sample(range(1, 10_000), len(chosen))
    edges = [(s, d, float(w)) for (s, d), w in zip(chosen, weights)]
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst", "weight"]),
        keys={"directed": False},
    )
    got = {(r.src, r.dst, r.weight) for r in minimum_spanning_forest(g).collect()}
    ng = nx.Graph()
    ng.add_weighted_edges_from(edges)
    ref = {
        (min(s, d), max(s, d), dd["weight"])
        for s, d, dd in nx.minimum_spanning_edges(ng, data=True)
    }
    # distinct weights -> the MST is unique -> exact edge-set equality
    assert got == ref


def test_mst_equal_weight_ties_valid_and_optimal(spark):
    rng = random.Random(11)
    edges = []
    for i in range(30):
        for j in range(i + 1, 30):
            if rng.random() < 0.2:
                edges.append((f"n{i:02d}", f"n{j:02d}", float(rng.choice([1, 2, 3]))))
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst", "weight"]),
        keys={"directed": False},
    )
    got = [(r.src, r.dst, r.weight) for r in minimum_spanning_forest(g).collect()]
    _assert_valid_spanning_forest(got, edges)
    assert abs(sum(w for _, _, w in got) - _nx_mst_weight(edges)) < 1e-9
    # determinism under ties: a second run returns the same edge set
    again = [(r.src, r.dst, r.weight) for r in minimum_spanning_forest(g).collect()]
    assert sorted(got) == sorted(again)


def test_mst_disconnected_forest_and_parallel_edges(spark):
    edges = [
        # component 1: triangle, parallel edge on (a,b) with a cheaper copy
        ("a", "b", 5.0), ("b", "a", 2.0), ("b", "c", 3.0), ("a", "c", 4.0),
        # component 2: single edge + self loop (never spans)
        ("x", "y", 7.0), ("x", "x", 0.5),
    ]
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst", "weight"]),
        keys={"directed": False},
    )
    got = {(r.src, r.dst, r.weight) for r in minimum_spanning_forest(g).collect()}
    assert got == {("a", "b", 2.0), ("b", "c", 3.0), ("x", "y", 7.0)}
    assert minimum_spanning_weight(g) == pytest.approx(12.0)


def test_mst_unweighted_and_empty(spark):
    # unweighted -> every weight 1.0: any spanning tree, n-1 edges
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]), keys={"directed": False})
    got = minimum_spanning_forest(g).collect()
    assert len(got) == 3 and all(r.weight == 1.0 for r in got)
    empty = LinkGraph(
        spark.createDataFrame([], "src string, dst string"), keys={"directed": False}
    )
    assert minimum_spanning_forest(empty).count() == 0
    assert minimum_spanning_weight(empty) == 0.0


def test_mst_directed_raises(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError, match="undirected"):
        minimum_spanning_forest(g)


def test_mst_long_chain_contraction(spark):
    # increasing weights along a path: round 1 makes every comp pick its
    # left edge, so the contraction graph is ONE long chain — the case that
    # breaks naive min-label merging and exercises the two-star/CC reuse
    n = 60
    edges = [(f"n{i:02d}", f"n{i + 1:02d}", float(i + 1)) for i in range(n - 1)]
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst", "weight"]),
        keys={"directed": False},
    )
    got = {(r.src, r.dst) for r in minimum_spanning_forest(g).collect()}
    assert got == {(s, d) for s, d, _ in edges}
