"""Maximal independent set: validity, maximality, determinism."""

import networkx as nx
import pytest

from linkgraph import LinkGraph, maximal_independent_set
from tests.fixtures import random_digraph


def _assert_valid_mis(mis, edges, nodes):
    g = nx.Graph()
    g.add_nodes_from(nodes)
    g.add_edges_from((s, d) for s, d in edges if s != d)
    for u, v in g.edges:
        assert not (u in mis and v in mis), f"adjacent pair {u},{v} both in MIS"
    for n in g:
        assert n in mis or any(nb in mis for nb in g[n]), f"{n} not dominated"


def test_mis_valid_on_random_graphs(spark):
    for seed in (1, 2):
        edges = [(s, d) for s, d, _ in random_digraph(60, 0.08, seed=seed)]
        g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                      keys={"directed": False})
        nodes = [r["id"] for r in g.nodes.collect()]
        mis = {r["id"] for r in maximal_independent_set(g, seed=seed).collect()}
        _assert_valid_mis(mis, edges, nodes)


def test_mis_deterministic_and_seed_sensitive(spark):
    edges = [(s, d) for s, d, _ in random_digraph(50, 0.1, seed=4)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    a = {r["id"] for r in maximal_independent_set(g, seed=9).collect()}
    b = {r["id"] for r in maximal_independent_set(g, seed=9).collect()}
    assert a == b
    nodes = [r["id"] for r in g.nodes.collect()]
    c = {r["id"] for r in maximal_independent_set(g, seed=10).collect()}
    _assert_valid_mis(c, edges, nodes)  # different seed: still a valid MIS


def test_mis_edge_free_and_self_loops(spark):
    # self-loops ignored; an edge-free pool joins wholesale as isolated
    edges = [("a", "a"), ("b", "c")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    mis = {r["id"] for r in maximal_independent_set(g).collect()}
    assert "a" in mis and len(mis & {"b", "c"}) == 1


def test_mis_directed_symmetrized(spark):
    # direction is irrelevant to independence: a->b means a,b never both in
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    mis = {r["id"] for r in maximal_independent_set(g).collect()}
    assert len(mis) == 1 and mis <= {"a", "b"}


def test_mis_path_matches_python_replay(spark):
    # exact replay of the deterministic rounds on a 10-path
    import hashlib

    nodes = [f"n{i}" for i in range(10)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(9)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    got = {r["id"] for r in maximal_independent_set(g, seed=2).collect()}

    adj = {n: set() for n in nodes}
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    pool, chosen, rnd = set(nodes), set(), 0
    while pool:
        pri = {
            n: hashlib.md5(f"{n}\x1f2\x1f{rnd}".encode()).hexdigest()
            for n in pool
        }
        winners = {
            n for n in pool
            if all(pri[n] < pri[m] for m in adj[n] & pool)
        }
        chosen |= winners
        pool -= winners | {m for w in winners for m in adj[w]}
        rnd += 1
    assert got == chosen


def test_greedy_coloring_proper_and_complete(spark):
    from linkgraph import greedy_coloring

    edges = [(s, d) for s, d, _ in random_digraph(50, 0.1, seed=8)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    colors = {r["id"]: r["color"] for r in greedy_coloring(g, seed=1).collect()}
    nodes = {r["id"] for r in g.nodes.collect()}
    assert set(colors) == nodes  # every node colored exactly once
    for s, d in edges:
        if s != d:
            assert colors[s] != colors[d], f"edge {s}-{d} monochromatic"
    # deterministic
    again = {r["id"]: r["color"] for r in greedy_coloring(g, seed=1).collect()}
    assert colors == again


def test_greedy_coloring_star_two_colors(spark):
    from linkgraph import greedy_coloring

    edges = [("c", f"l{i}") for i in range(10)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    colors = {r["id"]: r["color"] for r in greedy_coloring(g).collect()}
    assert set(colors.values()) == {0, 1}
    assert len({colors[f"l{i}"] for i in range(10)}) == 1  # leaves same color
    assert colors["c"] != colors["l0"]


def test_greedy_coloring_max_colors_raises(spark):
    from linkgraph import greedy_coloring

    edges = [("a", "b"), ("b", "c"), ("a", "c")]  # triangle needs 3 colors
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    with pytest.raises(RuntimeError, match="max_colors"):
        greedy_coloring(g, max_colors=2)
