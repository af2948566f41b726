"""k-core / core_number parity vs networkx, plus plan shape."""

import networkx as nx
import pytest

from linkgraph import LinkGraph, core_number, k_core
from tests.fixtures import random_digraph


def _nx_graph(edges):
    g = nx.Graph()
    g.add_edges_from((s, d) for s, d, *_ in edges if s != d)
    return g


def test_k_core_clique_plus_tail(spark):
    # K5 clique (core 4) with a 3-node tail hanging off (core 1)
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    tail = [("c0", "t1"), ("t1", "t2"), ("t2", "t3")]
    g = LinkGraph(spark.createDataFrame(clique + tail, ["src", "dst"]))
    assert sorted(r["id"] for r in k_core(g, 2).collect()) == sorted(
        f"c{i}" for i in range(5)
    )
    assert sorted(r["id"] for r in k_core(g, 4).collect()) == sorted(
        f"c{i}" for i in range(5)
    )
    assert k_core(g, 5).count() == 0
    # k=1 keeps every non-isolated node; k=0 keeps all nodes
    assert k_core(g, 1).count() == 8
    assert k_core(g, 0).count() == 8


def test_core_number_networkx_parity(spark):
    edges = random_digraph(60, 0.07, seed=11)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    got = {r["id"]: r["core"] for r in core_number(g).collect()}
    ref = nx.core_number(_nx_graph(edges))
    assert got == ref


def test_core_number_isolated_nodes(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("iso",)], ["id"])
    g = LinkGraph(edges, nodes=nodes)
    got = {r["id"]: r["core"] for r in core_number(g).collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "iso": 0}


def test_k_core_validation(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError):
        k_core(g, -1)


# ---------------------------------------------------------------------------
# k-truss (triangle-support edge peeling, beyond reference)


def _truss_edges(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def test_ktruss_matches_networkx(spark):
    import random

    import networkx as nx

    from linkgraph import k_truss

    rng = random.Random(17)
    nodes = [f"n{i}" for i in range(24)]
    edges = sorted({
        (a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.25
    })
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    nxg = nx.Graph()
    nxg.add_edges_from(edges)
    for k in (3, 4, 5):
        exp = {tuple(sorted(e)) for e in nx.k_truss(nxg, k).edges()}
        got = _truss_edges(k_truss(g, k))
        assert got == exp, k


def test_ktruss_clique_and_tail(spark):
    from linkgraph import k_truss

    # K5 + pendant edge: K5 edges have support 3 within the clique, the
    # pendant has 0 → 5-truss is exactly the K5
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    edges = clique + [("c0", "tail")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = _truss_edges(k_truss(g, 5))
    assert got == {(a, b) for a, b in clique}
    # peeling cascade: k=6 kills everything (support needed 4 > 3)
    assert _truss_edges(k_truss(g, 6)) == set()
    # k=2: full simple edge set survives
    assert len(_truss_edges(k_truss(g, 2))) == len(edges)


def test_ktruss_bad_k_raises(spark):
    from linkgraph import k_truss

    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError):
        k_truss(g, 1)


# ----------------------------------------------------------- onion layers


def test_onion_layers_networkx_parity(spark):
    import networkx as nx

    from linkgraph import onion_layers

    # K4 core + spokes + a chain + an isolated node: isolates, chain
    # cascades (degree hits 0 mid-peel), and a ratcheting core bound
    pairs = (
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
        + [("a", "s1"), ("b", "s2")]
        + [("p0", "p1"), ("p1", "p2"), ("p2", "p3")]
    )
    nodes = sorted({v for e in pairs for v in e} | {"iso"})
    df = spark.createDataFrame(pairs, ["src", "dst"])
    ndf = spark.createDataFrame([(v,) for v in nodes], ["id"])
    g = LinkGraph(df, nodes=ndf, keys={"directed": False})
    got = {r["id"]: r["layer"] for r in onion_layers(g).collect()}
    G = nx.Graph(pairs)
    G.add_node("iso")
    assert got == nx.onion_layers(G)


def test_onion_layers_star_and_cycle(spark):
    import networkx as nx

    from linkgraph import onion_layers

    pairs = [("h", f"l{i}") for i in range(6)]
    g = LinkGraph(spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False})
    got = {r["id"]: r["layer"] for r in onion_layers(g).collect()}
    assert got == nx.onion_layers(nx.Graph(pairs))
    cyc = [(f"c{i}", f"c{(i+1) % 5}") for i in range(5)]
    g2 = LinkGraph(spark.createDataFrame(cyc, ["src", "dst"]), keys={"directed": False})
    got2 = {r["id"]: r["layer"] for r in onion_layers(g2).collect()}
    assert got2 == nx.onion_layers(nx.Graph(cyc))
