"""Maximal matching: validity, maximality, determinism, python replay."""

import hashlib

import networkx as nx
import pytest

from linkgraph import LinkGraph, maximal_matching
from tests.fixtures import random_digraph


def _assert_valid_matching(m, edges):
    g = nx.Graph((s, d) for s, d in edges if s != d)
    seen = set()
    for u, v in m:
        assert g.has_edge(u, v)
        assert u not in seen and v not in seen, "edges share an endpoint"
        seen |= {u, v}
    assert nx.is_maximal_matching(g, {(u, v) for u, v in m})


def test_matching_valid_on_random_graphs(spark):
    for seed in (1, 3):
        edges = [(s, d) for s, d, _ in random_digraph(60, 0.07, seed=seed)]
        g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                      keys={"directed": False})
        m = {(r.src, r.dst) for r in maximal_matching(g, seed=seed).collect()}
        _assert_valid_matching(m, edges)


def test_matching_deterministic(spark):
    edges = [(s, d) for s, d, _ in random_digraph(40, 0.12, seed=6)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    a = sorted(tuple(r) for r in maximal_matching(g, seed=5).collect())
    b = sorted(tuple(r) for r in maximal_matching(g, seed=5).collect())
    assert a == b


def test_matching_star_single_edge_and_empty(spark):
    edges = [("c", f"l{i}") for i in range(8)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    m = maximal_matching(g).collect()
    assert len(m) == 1  # every star edge shares the center
    loops = LinkGraph(spark.createDataFrame([("x", "x")], ["src", "dst"]),
                      keys={"directed": False})
    assert maximal_matching(loops).count() == 0


def test_matching_path_matches_python_replay(spark):
    nodes = [f"n{i}" for i in range(12)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(11)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    got = {(r.src, r.dst) for r in maximal_matching(g, seed=4).collect()}

    pool = {(min(s, d), max(s, d)) for s, d in edges}
    chosen, rnd = set(), 0
    while pool:
        pri = {
            e: hashlib.md5(f"{e[0]}\x1f{e[1]}\x1f4\x1f{rnd}".encode()).hexdigest()
            for e in pool
        }
        nmin = {}
        for (a, b), p in pri.items():
            for n in (a, b):
                nmin[n] = min(nmin.get(n, "g"), p)
        winners = {e for e, p in pri.items() if p == nmin[e[0]] == nmin[e[1]]}
        chosen |= winners
        used = {n for e in winners for n in e}
        pool = {e for e in pool if e[0] not in used and e[1] not in used}
        rnd += 1
    assert got == chosen
