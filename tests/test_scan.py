"""SCAN structural clustering — hand-derived closed-neighborhood oracle on
an 11-node fixture: two 4-cliques bridged at (n0, n4), a 2-anchor satellite
n8 (border), a cross-clique connector n9 (hub), and its pendant n10
(outlier)."""

import math

import pytest

from linkgraph import LinkGraph, scan_clustering, structural_similarity


CLIQUE_A = [("n%d" % i, "n%d" % j) for i in range(4) for j in range(i + 1, 4)]
CLIQUE_B = [("n%d" % i, "n%d" % j) for i in range(4, 8) for j in range(i + 1, 8)]
EXTRA = [("n0", "n4"), ("n1", "n8"), ("n2", "n8"), ("n1", "n9"), ("n5", "n9"),
         ("n9", "n10")]


def _graph(spark):
    e = spark.createDataFrame(CLIQUE_A + CLIQUE_B + EXTRA, ["src", "dst"])
    return LinkGraph(e, keys={"directed": False})


def test_structural_similarity_closed_form(spark):
    sims = {
        (r["a"], r["b"]): r["similarity"]
        for r in structural_similarity(_graph(spark)).collect()
    }
    # all 18 canonical edges present
    assert len(sims) == 18
    # bridge: closed nbhds {n0..n4} vs {n0,n4..n7} share {n0,n4}
    assert sims[("n0", "n4")] == pytest.approx(2 / math.sqrt(25))
    # in-clique edge with satellite overlap: Γ(n1)∩Γ(n2) = {n0,n1,n2,n3,n8}
    assert sims[("n1", "n2")] == pytest.approx(5 / math.sqrt(30))
    # satellite edge right at the eps boundary: 3/sqrt(18) ≈ 0.7071
    assert sims[("n1", "n8")] == pytest.approx(3 / math.sqrt(18))
    # connector has nothing in common beyond the endpoints; Γ(n9) is
    # {n9, n1, n5, n10} (the pendant counts)
    assert sims[("n1", "n9")] == pytest.approx(2 / math.sqrt(24))
    # pendant: {n9,n10} over sqrt(2·4)
    assert sims[("n10", "n9")] == pytest.approx(2 / math.sqrt(8))


def test_scan_roles_and_clusters(spark):
    res = scan_clustering(_graph(spark), eps=0.7, mu=4)
    rows = {r["id"]: (r["role"], r["cluster"]) for r in res.labels.collect()}
    assert len(rows) == 11
    for i in range(4):
        assert rows[f"n{i}"] == ("core", "n0")
    for i in range(4, 8):
        assert rows[f"n{i}"] == ("core", "n4")
    assert rows["n8"] == ("border", "n0")  # eps-edges to cores n1, n2
    assert rows["n9"] == ("hub", None)     # neighbors in both clusters
    assert rows["n10"] == ("outlier", None)


def test_scan_param_validation(spark):
    g = _graph(spark)
    with pytest.raises(ValueError):
        scan_clustering(g, eps=0.0)
    with pytest.raises(ValueError):
        scan_clustering(g, mu=1)


def _scan_reference(edges, eps, mu):
    """Brute-force SCAN: closed-neighborhood cosine sims, eps-cores,
    BFS clusters over core-core eps-edges, min-cluster borders, hub/outlier
    split — mirrors the paper definitions with min-id labels."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    gamma = {v: adj[v] | {v} for v in nodes}
    sig = {}
    for a, b in {(min(x, y), max(x, y)) for x, y in edges if x != y}:
        sig[(a, b)] = len(gamma[a] & gamma[b]) / (
            (len(gamma[a]) * len(gamma[b])) ** 0.5
        )
    eps_nb = {
        v: {u for u in adj[v] if sig[(min(u, v), max(u, v))] >= eps}
        for v in nodes
    }
    cores = {v for v in nodes if len(eps_nb[v]) + 1 >= mu}
    cluster = {}
    for seed in sorted(cores):
        if seed in cluster:
            continue
        comp, frontier = {seed}, [seed]
        while frontier:
            v = frontier.pop()
            for u in eps_nb[v]:
                if u in cores and u not in comp:
                    comp.add(u)
                    frontier.append(u)
        lbl = min(comp)
        for v in comp:
            cluster[v] = lbl
    roles = {}
    for v in nodes:
        if v in cores:
            roles[v] = ("core", cluster[v])
    for v in nodes:
        if v in cores:
            continue
        att = {cluster[u] for u in eps_nb[v] if u in cores}
        if att:
            roles[v] = ("border", min(att))
    member = {v: rc[1] for v, rc in roles.items()}
    for v in nodes:
        if v in roles:
            continue
        ncl = {member[u] for u in adj[v] if u in member}
        roles[v] = ("hub", None) if len(ncl) >= 2 else ("outlier", None)
    return roles


def test_scan_random_graph_parity(spark):
    import random

    rng = random.Random(1234)
    nodes = [f"v{i:02d}" for i in range(40)]
    edges = sorted(
        {
            (a, b)
            for a in nodes
            for b in nodes
            if a < b and rng.random() < 0.12
        }
    )
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]), keys={"directed": False}
    )
    for eps, mu in [(0.5, 3), (0.7, 2), (0.6, 4)]:
        want = _scan_reference(edges, eps, mu)
        got = {
            r["id"]: (r["role"], r["cluster"])
            for r in scan_clustering(g, eps=eps, mu=mu).labels.collect()
        }
        assert got == want, (eps, mu)
