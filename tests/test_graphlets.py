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


def _brute_orbits(nodes, es):
    from collections import defaultdict

    adj = defaultdict(set)
    for e in es:
        a, b = tuple(e)
        adj[a].add(b)
        adj[b].add(a)
    orb = {v: [0] * 15 for v in nodes}
    for v in nodes:
        orb[v][0] = len(adj[v])
    for t in itertools.combinations(nodes, 3):
        prs = list(itertools.combinations(t, 2))
        k = sum(frozenset(p) in es for p in prs)
        if k < 2:
            continue
        deg = {n: sum(1 for p in prs if frozenset(p) in es and n in p) for n in t}
        for n in t:
            if k == 2:
                orb[n][2 if deg[n] == 2 else 1] += 1
            else:
                orb[n][3] += 1
    for q in itertools.combinations(nodes, 4):
        prs = list(itertools.combinations(q, 2))
        k = sum(frozenset(p) in es for p in prs)
        deg = {n: sum(1 for p in prs if frozenset(p) in es and n in p) for n in q}
        if min(deg.values()) == 0:
            continue
        for n in q:
            if k == 3:
                if max(deg.values()) == 2:
                    orb[n][5 if deg[n] == 2 else 4] += 1
                else:
                    orb[n][7 if deg[n] == 3 else 6] += 1
            elif k == 4:
                if max(deg.values()) == 2:
                    orb[n][8] += 1
                elif deg[n] == 1:
                    orb[n][9] += 1
                elif deg[n] == 3:
                    orb[n][11] += 1
                else:
                    orb[n][10] += 1
            elif k == 5:
                orb[n][13 if deg[n] == 3 else 12] += 1
            elif k == 6:
                orb[n][14] += 1
    return orb


def test_orbits_match_bruteforce_and_census(spark):
    from linkgraph.algorithms.graphlets import graphlet_orbits4

    rng = random.Random(23)
    nodes = [f"v{i}" for i in range(10)]
    edges = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.45
    ]
    es = set(frozenset(e) for e in edges)
    exp = _brute_orbits(nodes, es)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    rows = graphlet_orbits4(g).collect()
    got = {r["id"]: [r[f"o{i}"] for i in range(15)] for r in rows}
    for v in got:
        assert got[v] == exp[v], (v, got[v], exp[v])
    # cross-check column sums against the census (each graphlet counted
    # once per participating vertex: P4/claw/C4/paw have 4 vertex slots
    # split across orbits, diamond 2+2, K4 4)
    cen = graphlet_census4(g).collect()[0]
    sums = [sum(r[f"o{i}"] for r in rows) for i in range(15)]
    assert sums[3] == 3 * cen["triangles"]
    assert sums[4] == 2 * cen["p4_path"] and sums[5] == 2 * cen["p4_path"]
    assert sums[6] == 3 * cen["claw"] and sums[7] == cen["claw"]
    assert sums[8] == 4 * cen["cycle4"]
    assert sums[9] == cen["paw"] and sums[10] == 2 * cen["paw"]
    assert sums[11] == cen["paw"]
    assert sums[12] == 2 * cen["diamond"] and sums[13] == 2 * cen["diamond"]
    assert sums[14] == 4 * cen["k4"]


def test_weighted_clustering_networkx_parity(spark):
    import networkx as nx
    from linkgraph import weighted_clustering_coefficient

    rng = random.Random(13)
    nodes = [f"n{i}" for i in range(9)]
    edges = [
        (a, b, round(rng.uniform(0.1, 5.0), 3))
        for i, a in enumerate(nodes)
        for b in nodes[i + 1:]
        if rng.random() < 0.45
    ]
    G = nx.Graph()
    G.add_nodes_from(nodes)
    G.add_weighted_edges_from(edges)
    exp = nx.clustering(G, weight="weight")
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst", "weight"]),
        nodes=spark.createDataFrame([(x,) for x in nodes], ["id"]),
        keys={"directed": False},
    )
    got = {
        r["id"]: r["wcc"]
        for r in weighted_clustering_coefficient(g).collect()
    }
    for v in nodes:
        assert abs(got.get(v, 0.0) - exp[v]) < 1e-9


def test_weighted_clustering_requires_weights(spark):
    import pytest as _pytest
    from linkgraph import weighted_clustering_coefficient

    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with _pytest.raises(ValueError):
        weighted_clustering_coefficient(g)
