"""4-node graphlet census vs brute-force enumeration."""

import itertools
import random

import pytest

from linkgraph.graph import LinkGraph
from linkgraph.algorithms.graphlets import graphlet_census4


def _brute(nodes, edges):
    es = set(frozenset(e) for e in edges)
    deg = {n: 0 for n in nodes}
    for e in es:
        a, b = tuple(e)
        deg[a] += 1
        deg[b] += 1
    out = dict(
        wedges=sum(d * (d - 1) // 2 for d in deg.values()),
        triangles=0, p4_path=0, claw=0, cycle4=0, paw=0, diamond=0, k4=0,
    )
    out["triangles"] = sum(
        1
        for t in itertools.combinations(nodes, 3)
        if all(frozenset(p) in es for p in itertools.combinations(t, 2))
    )
    for quad in itertools.combinations(nodes, 4):
        pairs = list(itertools.combinations(quad, 2))
        sub = [frozenset(p) in es for p in pairs]
        k = sum(sub)
        d = {n: 0 for n in quad}
        for p, present in zip(pairs, sub):
            if present:
                a, b = tuple(p)
                d[a] += 1
                d[b] += 1
        if min(d.values()) == 0:
            continue
        if k == 3:
            out["claw" if max(d.values()) == 3 else "p4_path"] += 1
        elif k == 4:
            out["cycle4" if max(d.values()) == 2 else "paw"] += 1
        elif k == 5:
            out["diamond"] += 1
        elif k == 6:
            out["k4"] += 1
    return out


def test_census_matches_bruteforce_random(spark):
    rng = random.Random(11)
    for _ in range(2):
        n = 10
        nodes = [f"v{i}" for i in range(n)]
        edges = [
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.4
        ]
        exp = _brute(nodes, edges)
        g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
        got = graphlet_census4(g).collect()[0].asDict()
        assert got == exp


def test_census_k5(spark):
    """Closed forms on K5: C(5,2) wedges per vertex... all counts known."""
    nodes = [f"k{i}" for i in range(5)]
    edges = list(itertools.combinations(nodes, 2))
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    row = graphlet_census4(g).collect()[0]
    assert row["k4"] == 5  # C(5,4)
    assert row["triangles"] == 10  # C(5,3)
    assert row["wedges"] == 30  # 5 * C(4,2)
    # K5 has no induced proper-subgraph graphlets
    assert (
        row["p4_path"] == row["claw"] == row["cycle4"] == row["paw"]
        == row["diamond"] == 0
    )


def test_census_max_degree_is_induced_subgraph_census(spark):
    """max_degree drops hubs and censuses the induced subgraph on the rest
    — exact there, verified against brute force on the same subgraph."""
    nodes = [f"h{i}" for i in range(8)]
    edges = [(nodes[0], x) for x in nodes[1:]] + [
        (nodes[1], nodes[2]),
        (nodes[2], nodes[3]),
        (nodes[3], nodes[4]),
    ]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert graphlet_census4(g).collect()[0].asDict() == _brute(nodes, edges)
    # h0 has degree 7; cap at 3 removes it, leaving the path h1-h2-h3-h4
    sub_nodes = nodes[1:]
    sub_edges = [(nodes[1], nodes[2]), (nodes[2], nodes[3]), (nodes[3], nodes[4])]
    capped = graphlet_census4(g, max_degree=3).collect()[0].asDict()
    assert capped == _brute(sub_nodes, sub_edges)
