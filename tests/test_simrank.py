"""SimRank vs networkx + star closed forms + guards."""

import random

import pytest

from linkgraph import LinkGraph, simrank


def _g(spark, edges, directed=True):
    return LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]),
        keys={"directed": directed},
    )


def test_vs_networkx_directed(spark):
    import networkx as nx

    rng = random.Random(19)
    nodes = [f"n{i}" for i in range(14)]
    edges = list(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(40)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    got = {
        (r["u"], r["v"]): r["similarity"]
        for r in simrank(
            _g(spark, edges), importance_factor=0.8, tol=1e-9
        ).collect()
    }
    # networkx's simrank uses predecessors, same as the Jeh-Widom paper.
    # Compare against nx's REFERENCE python implementation: the default
    # numpy dispatch applies its tolerance differently and carries ~2e-6
    # convergence dust (measured), which is nx's looseness, not ours.
    G = nx.DiGraph(edges)
    ref = getattr(
        nx.algorithms.similarity, "_simrank_similarity_python", None
    )
    if ref is not None:
        want = ref(G, importance_factor=0.8, tolerance=1e-9)
        tol = 1e-6
    else:  # future networkx without the private helper: public dispatch
        want = nx.simrank_similarity(G, importance_factor=0.8, tolerance=1e-9)
        tol = 1e-4
    for u in G:
        for v in G:
            if u < v:
                assert got.get((u, v), 0.0) == pytest.approx(
                    want[u][v], abs=tol
                ), (u, v)


def test_undirected_star_closed_form(spark):
    # undirected star: leaves share the hub -> s(leaf_i, leaf_j) = C;
    # hub vs leaf: s(h, l) = C * mean over leaf pairs of s(l', l)
    edges = [("h", f"l{i}") for i in range(4)]
    got = {
        (r["u"], r["v"]): r["similarity"]
        for r in simrank(
            _g(spark, edges, directed=False), importance_factor=0.6, tol=1e-12
        ).collect()
    }
    for i in range(4):
        for j in range(i + 1, 4):
            assert got[(f"l{i}", f"l{j}")] == pytest.approx(0.6, abs=1e-9)


def test_guards(spark):
    g = _g(spark, [("a", "b")])
    with pytest.raises(ValueError):
        simrank(g, importance_factor=1.0)
    with pytest.raises(ValueError):
        simrank(g, max_nodes=1)


def test_min_similarity_filters(spark):
    edges = [("c", "a"), ("c", "b")]  # a,b share IN-neighbor c -> similar
    out = simrank(_g(spark, edges), min_similarity=0.5)
    rows = {(r["u"], r["v"]): r["similarity"] for r in out.collect()}
    assert set(rows) == {("a", "b")} and rows[("a", "b")] == pytest.approx(0.9)


def test_zero_node_graph_returns_empty(spark):
    from linkgraph import LinkGraph

    g = LinkGraph(spark.createDataFrame([], "src string, dst string"))
    assert simrank(g).count() == 0
