"""average_neighbor_degree / average_degree_connectivity / s_metric:
networkx parity on random graphs plus hand-checked closed forms."""

import math
import random

import networkx as nx
import pytest

from linkgraph import (
    LinkGraph,
    average_degree_connectivity,
    average_neighbor_degree,
    s_metric,
)


def _g(spark, nxg):
    edges = [(str(u), str(v)) for u, v in nxg.edges()]
    return LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]), keys={"directed": False}
    )


def test_avg_neighbor_degree_star(spark):
    # star: hub's neighbors all have degree 1; each leaf's neighbor has degree 4
    nxg = nx.star_graph(4)
    got = {
        r["id"]: r["avg_nbr_deg"]
        for r in average_neighbor_degree(_g(spark, nxg)).collect()
    }
    assert got["0"] == pytest.approx(1.0)
    for leaf in "1234":
        assert got[leaf] == pytest.approx(4.0)


@pytest.mark.parametrize("seed", [0, 7])
def test_avg_neighbor_degree_random_parity(spark, seed):
    nxg = nx.gnm_random_graph(30, 70, seed=seed)
    nxg.remove_nodes_from(list(nx.isolates(nxg)))
    want = nx.average_neighbor_degree(nxg)
    got = {
        r["id"]: r["avg_nbr_deg"]
        for r in average_neighbor_degree(_g(spark, nxg)).collect()
    }
    assert set(got) == {str(n) for n in want}
    for n, v in want.items():
        assert got[str(n)] == pytest.approx(v, abs=1e-12)


@pytest.mark.parametrize("seed", [1, 11])
def test_degree_connectivity_random_parity(spark, seed):
    nxg = nx.gnm_random_graph(25, 60, seed=seed)
    nxg.remove_nodes_from(list(nx.isolates(nxg)))
    want = nx.average_degree_connectivity(nxg)
    got = {
        r["degree"]: r["knn"]
        for r in average_degree_connectivity(_g(spark, nxg)).collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


@pytest.mark.parametrize("seed", [2, 5])
def test_s_metric_random_parity(spark, seed):
    nxg = nx.gnm_random_graph(20, 45, seed=seed)
    want = float(nx.s_metric(nxg))
    assert s_metric(_g(spark, nxg)) == pytest.approx(want, abs=1e-9)


def test_s_metric_path(spark):
    # path a-b-c: edges (a,b) deg 1*2 + (b,c) deg 2*1 = 4
    g = LinkGraph(
        spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"]),
        keys={"directed": False},
    )
    assert s_metric(g) == pytest.approx(4.0)


def test_parallel_edges_and_self_loops_collapsed(spark):
    # duplicates and loops must not change any of the three statistics
    base = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    noisy = base + [("a", "b"), ("b", "a"), ("d", "d")]
    g1 = LinkGraph(spark.createDataFrame(base, ["src", "dst"]), keys={"directed": False})
    g2 = LinkGraph(spark.createDataFrame(noisy, ["src", "dst"]), keys={"directed": False})
    a1 = sorted(map(tuple, average_neighbor_degree(g1).collect()))
    a2 = sorted(map(tuple, average_neighbor_degree(g2).collect()))
    assert a1 == a2
    assert s_metric(g1) == s_metric(g2)
    k1 = sorted(map(tuple, average_degree_connectivity(g1).collect()))
    k2 = sorted(map(tuple, average_degree_connectivity(g2).collect()))
    assert k1 == k2


def test_directed_raises(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError):
        average_neighbor_degree(g)
    with pytest.raises(ValueError):
        average_degree_connectivity(g)
    with pytest.raises(ValueError):
        s_metric(g)
