"""Generalized k-clique listing/count (arbitrary-k kClist)."""

import itertools
import random

from linkgraph import LinkGraph, clique4_count, k_clique_count, k_cliques

import pytest


def _k(n, prefix):
    return [
        (f"{prefix}{i}", f"{prefix}{j}")
        for i, j in itertools.combinations(range(n), 2)
    ]


def _brute(edges, k):
    nbr = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    return {
        q
        for q in itertools.combinations(sorted(nbr), k)
        if all(y in nbr[x] for x, y in itertools.combinations(q, 2))
    }


def test_k_clique_closed_forms(spark):
    # K6 + disjoint K4 + a path: C(6,k) + C(4,k) cliques
    edges = _k(6, "a") + _k(4, "b") + [("p0", "p1"), ("p1", "p2")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert k_clique_count(g, 3) == 20 + 4
    assert k_clique_count(g, 4) == 15 + 1
    assert k_clique_count(g, 5) == 6
    assert k_clique_count(g, 6) == 1
    assert k_clique_count(g, 7) == 0


def test_k4_agrees_with_clique4_count(spark):
    random.seed(7)
    nodes = [f"v{i}" for i in range(20)]
    edges = sorted(
        {(a, b) for a in nodes for b in nodes if a < b and random.random() < 0.35}
    )
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert k_clique_count(g, 4) == clique4_count(g)


def test_k_cliques_listing_matches_bruteforce(spark):
    random.seed(3)
    nodes = [f"v{i:02d}" for i in range(18)]
    edges = sorted(
        {(a, b) for a in nodes for b in nodes if a < b and random.random() < 0.4}
    )
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    for k in (3, 5):
        got = {tuple(r) for r in k_cliques(g, k).collect()}
        assert got == _brute(edges, k)
        # members id-sorted within each row
        assert all(t == tuple(sorted(t)) for t in got)


def test_k1_k2_and_degenerate(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "c")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert k_clique_count(g, 1) == 3
    assert {tuple(r) for r in k_cliques(g, 1).collect()} == {("a",), ("b",), ("c",)}
    assert k_clique_count(g, 2) == 2  # self-loop dropped
    assert {tuple(r) for r in k_cliques(g, 2).collect()} == {("a", "b"), ("b", "c")}
    with pytest.raises(ValueError):
        k_clique_count(g, 0)
    with pytest.raises(ValueError):
        k_cliques(g, 0)


def test_direction_and_duplicates_ignored(spark):
    edges = _k(5, "c")
    edges += [(b, a) for a, b in edges] + [("c0", "c0")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert k_clique_count(g, 5) == 1
