"""Transitivity and 4-cycle counting vs networkx and closed forms."""

import random

import pytest

from linkgraph import LinkGraph, square_count, transitivity


def _g(spark, edges):
    return LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]), keys={"directed": False}
    )


def _nx(edges):
    import networkx as nx

    G = nx.Graph()
    G.add_edges_from(edges)
    return G


def _py_squares(G):
    import itertools

    n = 0
    nodes = list(G)
    for quad in itertools.combinations(nodes, 4):
        sub = G.subgraph(quad)
        # count 4-cycles on the quad: the quad hosts a C4 iff it has a
        # spanning cycle; number of distinct C4s on 4 labeled nodes = 3
        # possible, count those whose 4 edges are present
        a, b, c, d = quad
        for perm in ((a, b, c, d), (a, b, d, c), (a, c, b, d)):
            w, x, y, z = perm
            if (
                G.has_edge(w, x)
                and G.has_edge(x, y)
                and G.has_edge(y, z)
                and G.has_edge(z, w)
            ):
                n += 1
    return n


def test_transitivity_closed_forms(spark):
    import networkx as nx

    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    assert transitivity(_g(spark, tri)) == pytest.approx(1.0)
    star = [("h", f"l{i}") for i in range(4)]
    assert transitivity(_g(spark, star)) == 0.0
    mixed = tri + [("c", "d")]
    assert transitivity(_g(spark, mixed)) == pytest.approx(
        nx.transitivity(_nx(mixed))
    )


def test_square_closed_forms(spark):
    c4 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    assert square_count(_g(spark, c4)) == 1
    # K4: three distinct 4-cycles
    k4 = c4 + [("a", "c"), ("b", "d")]
    assert square_count(_g(spark, k4)) == 3
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    assert square_count(_g(spark, tri)) == 0


def test_vs_networkx_random(spark):
    rng = random.Random(31)
    nodes = [f"n{i}" for i in range(14)]
    edges = list({tuple(sorted((rng.choice(nodes), rng.choice(nodes)))) for _ in range(45)})
    edges = [(u, v) for u, v in edges if u != v]
    import networkx as nx

    G = _nx(edges)
    assert transitivity(_g(spark, edges)) == pytest.approx(nx.transitivity(G))
    assert square_count(_g(spark, edges)) == _py_squares(G)
