"""Bridges + 2-edge-connected components: networkx parity, closed forms,
determinism, contract guards."""

import random

import networkx as nx
import pytest

from linkgraph import LinkGraph
from linkgraph.algorithms.bridges import bridges, two_edge_connected_components


def _graph(spark, edges, directed=False, nodes=None):
    df = spark.createDataFrame(edges, "src long, dst long")
    ndf = (
        spark.createDataFrame([(n,) for n in nodes], "id long")
        if nodes is not None
        else None
    )
    return LinkGraph(df, nodes=ndf, keys={"directed": directed})


def _nx_2ecc_labels(g: nx.Graph) -> dict:
    h = g.copy()
    h.remove_edges_from(nx.bridges(g))
    return {
        n: min(comp) for comp in nx.connected_components(h) for n in comp
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_networkx_parity_random(spark, seed):
    rng = random.Random(seed)
    n = 24
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(40)
            for a, b in [(rng.randrange(n), rng.randrange(n))]
            if a != b
        }
    )
    g = nx.Graph(edges)
    got = sorted(tuple(r) for r in bridges(_graph(spark, edges)).collect())
    want = sorted((min(a, b), max(a, b)) for a, b in nx.bridges(g))
    assert got == want

    labels = dict(
        two_edge_connected_components(_graph(spark, edges)).collect()
    )
    assert labels == _nx_2ecc_labels(g)


def test_path_all_bridges(spark):
    edges = [(i, i + 1) for i in range(6)]
    got = sorted(tuple(r) for r in bridges(_graph(spark, edges)).collect())
    assert got == edges
    labels = dict(two_edge_connected_components(_graph(spark, edges)).collect())
    assert labels == {i: i for i in range(7)}  # every node its own 2ecc


def test_cycle_no_bridges(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    assert bridges(_graph(spark, edges)).collect() == []
    labels = dict(two_edge_connected_components(_graph(spark, edges)).collect())
    assert labels == {i: 0 for i in range(5)}  # one 2ecc, min-id label


def test_two_cliques_one_bridge(spark):
    k = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k + [(a + 10, b + 10) for a, b in k] + [(3, 10)]
    got = sorted(tuple(r) for r in bridges(_graph(spark, edges)).collect())
    assert got == [(3, 10)]


def test_shared_vertex_no_bridge(spark):
    # two triangles sharing vertex 2: 2 is an articulation point but NO
    # edge is a bridge — the case degree-based heuristics get wrong
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    assert bridges(_graph(spark, edges)).collect() == []


def test_parallel_edges_simple_graph_semantics(spark):
    # duplicated rows collapse: (0,1) is still a bridge (nx.Graph semantics)
    edges = [(0, 1), (0, 1), (1, 0)]
    got = [tuple(r) for r in bridges(_graph(spark, edges)).collect()]
    assert got == [(0, 1)]


def test_self_loops_ignored_and_isolated_nodes(spark):
    edges = [(0, 0), (1, 2)]
    g = _graph(spark, edges, nodes=[0, 1, 2, 9])
    assert [tuple(r) for r in bridges(g).collect()] == [(1, 2)]
    labels = dict(two_edge_connected_components(g).collect())
    assert labels == {0: 0, 1: 1, 2: 2, 9: 9}


def test_directed_raises(spark):
    with pytest.raises(ValueError, match="undirected"):
        bridges(_graph(spark, [(0, 1)], directed=True))


def test_matches_driver_local_tarjan(spark):
    # two INDEPENDENT implementations (distributed XOR sketch vs the
    # driver-local lowlink DFS in cuts.py) must agree edge-for-edge
    from linkgraph.algorithms.cuts import bridges as tarjan_bridges

    rng = random.Random(11)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(55)
            for a, b in [(rng.randrange(30), rng.randrange(30))]
            if a != b
        }
    )
    g = _graph(spark, edges)
    got = sorted(tuple(r) for r in bridges(g).collect())
    want = sorted(tuple(r) for r in tarjan_bridges(g).collect())
    assert got == want


def test_deterministic(spark):
    rng = random.Random(7)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(30)
            for a, b in [(rng.randrange(18), rng.randrange(18))]
            if a != b
        }
    )
    g1 = sorted(tuple(r) for r in bridges(_graph(spark, edges)).collect())
    g2 = sorted(tuple(r) for r in bridges(_graph(spark, edges)).collect())
    assert g1 == g2
