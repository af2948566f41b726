"""Neighborhood function / effective diameter: exact parity, HLL accuracy."""

import networkx as nx
import pytest

from linkgraph import (LinkGraph, effective_diameter, hyperball_harmonic,
                       neighborhood_function)
from tests.fixtures import random_digraph


def _nx_nf(edges, directed):
    g = (nx.DiGraph if directed else nx.Graph)()
    g.add_edges_from(edges)
    dists = {v: nx.single_source_shortest_path_length(g, v) for v in g}
    radius = max((max(d.values()) for d in dists.values()), default=0)
    return [
        sum(sum(1 for x in d.values() if x <= r) for d in dists.values())
        for r in range(radius + 1)
    ]


def test_exact_matches_networkx_directed(spark):
    edges = random_digraph(40, 0.06, seed=5)
    e = [(s, d) for s, d, _ in edges]
    g = LinkGraph(spark.createDataFrame(e, ["src", "dst"]))
    got = {r["hop"]: r["pairs"] for r in
           neighborhood_function(g, max_hops=50, method="exact").collect()}
    ref = _nx_nf(e, directed=True)
    assert got == {h: n for h, n in enumerate(ref)}


def test_hll_equals_exact_on_small_graph(spark):
    # sparse-mode HLL is exact at small cardinalities: the two methods must
    # agree bit-for-bit on a 12-node graph
    e = [(f"n{i}", f"n{i + 1}") for i in range(11)] + [("n3", "n0"), ("n7", "n2")]
    g = LinkGraph(spark.createDataFrame(e, ["src", "dst"]))
    exact = sorted(tuple(r) for r in
                   neighborhood_function(g, method="exact").collect())
    hll = sorted(tuple(r) for r in
                 neighborhood_function(g, method="hll").collect())
    assert exact == hll


def test_hll_close_on_mid_graph(spark):
    # 300 nodes, balls in the hundreds: HLL (lg_k=12, ~1.6% per-sketch
    # error, partially cancelling across the sum) must land within 5%
    edges = [(s, d) for s, d, _ in random_digraph(300, 0.02, seed=9)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    exact = {r["hop"]: r["pairs"] for r in
             neighborhood_function(g, method="exact").collect()}
    hll = {r["hop"]: r["pairs"] for r in
           neighborhood_function(g, method="hll").collect()}
    assert set(hll) == set(exact)
    for h, n in exact.items():
        assert hll[h] == pytest.approx(n, rel=0.05)


def test_effective_diameter_path(spark):
    e = [(f"n{i}", f"n{i + 1}") for i in range(9)]
    g = LinkGraph(spark.createDataFrame(e, ["src", "dst"]),
                  keys={"directed": False})
    assert effective_diameter(g, fraction=1.0, method="exact") == 9
    assert effective_diameter(g, fraction=1.0, method="hll") == 9
    # 90% of the (10 + 2*sum pairs) mass is reached well before hop 9
    assert effective_diameter(g, fraction=0.9, method="exact") < 9


def test_hop0_and_validation(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    nf = {r["hop"]: r["pairs"] for r in
          neighborhood_function(g, max_hops=0).collect()}
    assert nf == {0: 2}
    with pytest.raises(ValueError, match="unknown method"):
        neighborhood_function(g, method="bogus")
    with pytest.raises(ValueError, match="fraction"):
        effective_diameter(g, fraction=0.0)


# ------------------------------------------------------------- HyperBall


def _nx_harmonic_forward(edges):
    g = nx.DiGraph(edges)
    out = {}
    for v in g:
        d = nx.single_source_shortest_path_length(g, v)
        out[v] = sum(1.0 / x for x in d.values() if x > 0)
    return out


def test_hyperball_exact_matches_nx(spark):
    edges = [(s, d) for s, d, _ in random_digraph(40, 0.08, seed=5)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = {
        r["id"]: r["harmonic"]
        for r in hyperball_harmonic(g, method="exact").collect()
    }
    want = _nx_harmonic_forward(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_hyperball_hll_exact_in_sparse_mode(spark):
    # small balls keep the sketches in sparse mode -> estimates are exact
    edges = [(s, d) for s, d, _ in random_digraph(30, 0.08, seed=6)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = {
        r["id"]: r["harmonic"]
        for r in hyperball_harmonic(g, method="hll", lg_k=12).collect()
    }
    want = _nx_harmonic_forward(edges)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_hyperball_matches_harmonic_centrality(spark):
    from linkgraph import harmonic_centrality

    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    hb = {r["id"]: r["harmonic"]
          for r in hyperball_harmonic(g, method="exact").collect()}
    hc = {r["id"]: r["harmonic"] for r in harmonic_centrality(g).collect()}
    assert set(hb) == set(hc)
    for k in hc:
        assert hb[k] == pytest.approx(hc[k], abs=1e-9)


def test_hyperball_max_hops_truncates(spark):
    # path a->b->c->d: with max_hops=1 only the 1/1 terms accumulate
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = {r["id"]: r["harmonic"]
           for r in hyperball_harmonic(g, method="exact", max_hops=1).collect()}
    assert got == {"a": 1.0, "b": 1.0, "c": 1.0, "d": 0.0}


def test_hyperball_bad_args(spark):
    edges = [("a", "b")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    with pytest.raises(ValueError):
        hyperball_harmonic(g, method="nope")
    with pytest.raises(ValueError):
        hyperball_harmonic(g, max_hops=-1)
