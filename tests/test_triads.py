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


def test_sinkhorn_numpy_parity(spark):
    import numpy as np
    from linkgraph import sinkhorn_normalize

    rng = np.random.RandomState(3)
    n = 6
    M = rng.uniform(0.5, 3.0, (n, n))
    edges = [
        (f"r{i}", f"c{j}", float(M[i, j])) for i in range(n) for j in range(n)
    ]
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst", "weight"]),
        keys={"directed": True},
    )
    out = {
        (r["src"], r["dst"]): r["weight"]
        for r in sinkhorn_normalize(g, iterations=12).collect()
    }
    A = M.copy()
    for _ in range(12):
        A = A / A.sum(axis=0, keepdims=True)
        A = A / A.sum(axis=1, keepdims=True)
    for i in range(n):
        for j in range(n):
            assert abs(out[(f"r{i}", f"c{j}")] - A[i, j]) < 1e-12
    # last pass is the row pass: rows exactly stochastic
    rows = {}
    for (s, _), w in out.items():
        rows[s] = rows.get(s, 0.0) + w
    assert all(abs(v - 1.0) < 1e-12 for v in rows.values())


def test_sinkhorn_rejects_nonpositive(spark):
    import pytest as _pytest
    from linkgraph import sinkhorn_normalize

    g = LinkGraph(
        spark.createDataFrame([("a", "b", 0.0)], ["src", "dst", "weight"]),
        keys={"directed": True},
    )
    with _pytest.raises(ValueError):
        sinkhorn_normalize(g, iterations=2)


def test_motif_significance_profile(spark):
    from linkgraph import motif_significance

    nodes = list(range(15))
    arcs = [
        (f"g{i}", f"g{j}")
        for i in nodes
        for j in nodes
        if i != j and (3 * i + 5 * j) % 9 < 4
    ]
    g = LinkGraph(
        spark.createDataFrame(arcs, ["src", "dst"]),
        nodes=spark.createDataFrame([(f"g{i}",) for i in nodes], ["id"]),
        keys={"directed": True},
    )
    rows = {r["triad"]: r for r in motif_significance(g, n_null=2, rounds=1, seed=9).collect()}
    assert len(rows) == 13 and "003" not in rows
    # z formula identity where defined; NULL exactly when std == 0
    for r in rows.values():
        if r["null_std_millionths"] == 0:
            assert r["z_millionths"] is None
        else:
            z = (r["observed"] * 1e6 - r["null_mean_millionths"]) / r["null_std_millionths"]
            assert abs(z * 1e6 - r["z_millionths"]) < 1.0
    rows2 = {r["triad"]: tuple(r) for r in motif_significance(g, n_null=2, rounds=1, seed=9).collect()}
    assert rows2 == {k: tuple(v) for k, v in rows.items()}
