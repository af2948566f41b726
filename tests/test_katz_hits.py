"""Katz centrality + HITS parity vs networkx, plus edge cases."""

import networkx as nx
import pytest

from linkgraph import LinkGraph, hits, katz_centrality
from tests.fixtures import random_digraph


def _collect(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_katz_networkx_parity_directed(spark):
    edges = random_digraph(40, 0.08, seed=7)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    got = _collect(katz_centrality(g, alpha=0.05, beta=1.0, tol=1e-10), "katz")
    ng = nx.DiGraph()
    ng.add_weighted_edges_from(edges)
    ref = nx.katz_centrality(ng, alpha=0.05, beta=1.0, tol=1e-10, max_iter=2000)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-7)


def test_katz_fixed_iterations_unnormalized(spark):
    # x0=0 → x1=beta → x2 = alpha*w_indeg*beta + beta, closed-form check
    edges = [("a", "b", 2.0), ("c", "b", 3.0), ("b", "c", 1.0)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    got = _collect(
        katz_centrality(g, alpha=0.1, beta=1.0, max_iter=2, tol=0, normalized=False),
        "katz",
    )
    assert got["a"] == pytest.approx(1.0)
    assert got["b"] == pytest.approx(0.1 * (2.0 + 3.0) * 1.0 + 1.0)
    assert got["c"] == pytest.approx(0.1 * 1.0 + 1.0)


def test_katz_divergence_raises(spark):
    # alpha=1.0 > 1/lambda_max on a cycle (lambda_max=1) with beta>0 diverges
    g = LinkGraph(
        spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        katz_centrality(g, alpha=1.0, beta=1.0, max_iter=30)


def _ref_hits(edges, tol, max_iter):
    """Pure-python HITS with networkx semantics (nx.hits needs scipy, which
    this container lacks): h uniform; per iteration a = Aᵀh, h' = A·a
    max-normalized; converge on Σ|h'−h| < tol; L1-normalize outputs."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    h = {n: 1.0 / len(nodes) for n in nodes}
    a = {}
    for _ in range(max_iter):
        hlast = h
        a = {n: 0.0 for n in nodes}
        for u, v, w in edges:
            a[v] += hlast[u] * w
        h = {n: 0.0 for n in nodes}
        for u, v, w in edges:
            h[u] += a[v] * w
        m = max(h.values())
        h = {n: x / m for n, x in h.items()}
        if sum(abs(h[n] - hlast[n]) for n in nodes) < tol:
            break
    sh = sum(h.values()) or 1.0
    sa = sum(a.values()) or 1.0
    return {n: x / sh for n, x in h.items()}, {n: x / sa for n, x in a.items()}


def test_hits_reference_parity_directed(spark):
    edges = random_digraph(40, 0.08, seed=13)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    res = hits(g, tol=1e-12, max_iter=500)
    got_h = _collect(res, "hub")
    got_a = _collect(res, "authority")
    ref_h, ref_a = _ref_hits(edges, tol=1e-12, max_iter=500)
    for k in ref_h:
        assert got_h[k] == pytest.approx(ref_h[k], abs=1e-7)
        assert got_a[k] == pytest.approx(ref_a[k], abs=1e-7)


def test_hits_bipartite_zero_sides(spark):
    # pure bipartite u->e: users have authority 0, events hub 0
    edges = [("u1", "e1"), ("u1", "e2"), ("u2", "e1")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    res = hits(g, tol=0, max_iter=3)
    got = {r["id"]: (r["hub"], r["authority"]) for r in res.collect()}
    assert got["e1"][0] == 0.0 and got["e2"][0] == 0.0
    assert got["u1"][1] == 0.0 and got["u2"][1] == 0.0
    # e1 has in-degree 2 > e2's 1
    assert got["e1"][1] > got["e2"][1]
    assert got["u1"][0] > got["u2"][0]


def test_hits_edge_free_graph(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",)], ["id"])
    g = LinkGraph(edges, nodes=nodes)
    res = hits(g, max_iter=5)
    for r in res.collect():
        assert r["hub"] == 0.0 and r["authority"] == 0.0


# ---------------------------------------------------------- eigenvector


def test_eigenvector_networkx_parity_weighted(spark):
    from linkgraph.algorithms.katz import eigenvector_centrality

    E = [("a", "b", 2.0), ("b", "c", 1.0), ("c", "d", 3.0),
         ("d", "a", 1.0), ("a", "c", 1.5), ("e", "a", 1.0)]
    und = E + [(v, u, w) for u, v, w in E]
    g = LinkGraph(spark.createDataFrame(und, ["src", "dst", "weight"]))
    mine = {
        r["id"]: r["eigenvector"]
        for r in eigenvector_centrality(g, max_iter=200, tol=1e-7).collect()
    }
    G = nx.Graph()
    G.add_weighted_edges_from(E)
    ref = nx.eigenvector_centrality(G, max_iter=500, tol=1e-10, weight="weight")
    assert mine.keys() == ref.keys()
    for k, v in ref.items():
        assert mine[k] == pytest.approx(v, abs=1e-4), k


def test_eigenvector_directed_and_bipartite_closed_form(spark):
    """Directed: in-edge convention (networkx). Bipartite K_{2,3}: the +I
    shift converges where unshifted power iteration oscillates, to the
    closed form x_u = 1/2, x_v = 1/sqrt(6)."""
    from linkgraph.algorithms.katz import eigenvector_centrality

    # a cycle keeps A non-nilpotent — on a DAG the power iteration only
    # converges polynomially and networkx raises there too
    D = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    g = LinkGraph(spark.createDataFrame(D, ["src", "dst"]))
    mine = {
        r["id"]: r["eigenvector"]
        for r in eigenvector_centrality(g, max_iter=300, tol=1e-7).collect()
    }
    G = nx.DiGraph(D)
    ref = nx.eigenvector_centrality(G, max_iter=1000, tol=1e-10)
    for k, v in ref.items():
        assert mine[k] == pytest.approx(v, abs=1e-3), k

    B = [(f"u{i}", f"v{j}") for i in range(2) for j in range(3)]
    und = B + [(b, a) for a, b in B]
    gb = LinkGraph(spark.createDataFrame(und, ["src", "dst"]))
    got = {r["id"]: r["eigenvector"]
           for r in eigenvector_centrality(gb, max_iter=200, tol=1e-6).collect()}
    for i in range(2):
        assert got[f"u{i}"] == pytest.approx(0.5, abs=1e-3)
    for j in range(3):
        assert got[f"v{j}"] == pytest.approx(6 ** -0.5, abs=1e-3)


def test_eigenvector_nonconvergence_raises_and_fixed_step(spark):
    from linkgraph.algorithms.katz import eigenvector_centrality

    g = LinkGraph(spark.createDataFrame(
        [("a", "b"), ("b", "a")], ["src", "dst"]))
    with pytest.raises(RuntimeError, match="did not converge"):
        eigenvector_centrality(g, max_iter=1, tol=1e-15)
    # fixed-step (tol=0) never raises and runs exactly max_iter steps:
    # one step from uniform on the 2-cycle is already the fixpoint 1/sqrt(2)
    out = {r["id"]: r["eigenvector"]
           for r in eigenvector_centrality(g, max_iter=1, tol=0).collect()}
    assert out["a"] == pytest.approx(2 ** -0.5)
    assert out["b"] == pytest.approx(2 ** -0.5)
