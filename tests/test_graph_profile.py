"""graph_profile — networkx parity of the one-row structural summary."""

import itertools

import pytest

from linkgraph import LinkGraph, graph_profile

nx = pytest.importorskip("networkx")


def _profile(spark, edges, extra_nodes=()):
    nodes = sorted({x for e in edges for x in e} | set(extra_nodes))
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]),
        nodes=spark.createDataFrame([(x,) for x in nodes], ["id"]),
    )
    return graph_profile(g).collect()[0].asDict()


def _nx_expect(edges, extra_nodes=()):
    G = nx.Graph(edges)
    G.add_nodes_from(extra_nodes)
    n = G.number_of_nodes()
    comps = list(nx.connected_components(G))
    degs = [d for _, d in G.degree()]
    return {
        "n_nodes": n,
        "n_edges_undirected": G.number_of_edges(),
        "density_millionths": round(nx.density(G) * 1e6),
        "n_components": len(comps),
        "largest_component": max(map(len, comps)),
        "n_triangles": sum(nx.triangles(G).values()) // 3,
        "transitivity_millionths": round(nx.transitivity(G) * 1e6),
        "max_degree": max(degs) if degs else 0,
        "avg_degree_millionths": round(sum(degs) / n * 1e6) if n else 0,
    }


def test_k4_path_isolated(spark):
    edges = [
        (f"k{i}", f"k{j}") for i, j in itertools.combinations(range(4), 2)
    ] + [("p0", "p1"), ("p1", "p2")]
    got = _profile(spark, edges, extra_nodes=["iso"])
    exp = _nx_expect(edges, extra_nodes=["iso"])
    for key, val in exp.items():
        assert got[key] == val, key
    assert got["n_edges"] == 8  # distinct directed


def test_direction_and_duplicates(spark):
    # reversed duplicate edges: directed count sees both, undirected one
    edges = [("a", "b"), ("b", "a"), ("b", "c")]
    got = _profile(spark, edges)
    assert got["n_edges"] == 3
    assert got["n_edges_undirected"] == 2
    assert got["n_components"] == 1
    assert got["largest_component"] == 3


def test_triangle_graph(spark):
    got = _profile(spark, [("1", "2"), ("2", "3"), ("3", "1")])
    assert got["n_triangles"] == 1
    assert got["transitivity_millionths"] == 1000000
    assert got["density_millionths"] == 1000000
