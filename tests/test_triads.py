"""Dyad + triad census vs networkx triadic_census."""

import random

import networkx as nx

from linkgraph.graph import LinkGraph
from linkgraph.algorithms.triads import (
    TRIAD_CLASSES,
    dyad_census,
    triad_census,
)


def _random_digraph(rng, n, p):
    nodes = [f"n{i}" for i in range(n)]
    arcs = [
        (a, b) for a in nodes for b in nodes if a != b and rng.random() < p
    ]
    return nodes, arcs


def test_triad_census_networkx_parity(spark):
    rng = random.Random(41)
    for p in (0.15, 0.45):
        nodes, arcs = _random_digraph(rng, 10, p)
        G = nx.DiGraph()
        G.add_nodes_from(nodes)
        G.add_edges_from(arcs)
        g = LinkGraph(
            spark.createDataFrame(arcs, ["src", "dst"]),
            nodes=spark.createDataFrame([(x,) for x in nodes], ["id"]),
            keys={"directed": True},
        )
        row = triad_census(g).collect()[0]
        got = {c: int(row[f"t{c.lower()}"]) for c in TRIAD_CLASSES}
        assert got == dict(nx.triadic_census(G))


def test_triad_census_sums_to_n_choose_3(spark):
    rng = random.Random(42)
    nodes, arcs = _random_digraph(rng, 9, 0.3)
    g = LinkGraph(
        spark.createDataFrame(arcs, ["src", "dst"]),
        nodes=spark.createDataFrame([(x,) for x in nodes], ["id"]),
        keys={"directed": True},
    )
    row = triad_census(g).collect()[0]
    assert sum(int(v) for v in row) == 9 * 8 * 7 // 6


def test_dyad_census_identities(spark):
    # 2 mutual pairs, 2 asym, loops + duplicate arcs collapse
    arcs = [
        ("a", "b"), ("b", "a"),
        ("c", "d"), ("d", "c"),
        ("a", "c"), ("b", "d"),
        ("a", "a"), ("a", "b"),
    ]
    g = LinkGraph(
        spark.createDataFrame(arcs, ["src", "dst"]),
        keys={"directed": True},
    )
    row = dyad_census(g).collect()[0]
    assert (int(row["mutual"]), int(row["asym"])) == (2, 2)
    assert int(row["null"]) == 4 * 3 // 2 - 4
