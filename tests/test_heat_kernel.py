"""Heat-kernel diffusion + clustering — linkgraph/algorithms/heat_kernel.py.

The diffusion test replays the truncated Taylor series densely in numpy
(same weights, same random-walk matrix) and checks the engine matches to
1e-9 — pinning the superstep arithmetic, not just the support set.
"""

import math

import numpy as np
import pytest

from linkgraph.algorithms.heat_kernel import (
    heat_kernel,
    heat_kernel_cluster,
    taylor_weights,
)
from linkgraph.graph import LinkGraph


def _two_cliques(spark, bridge=(("a0", "b0"),)):
    edges = []
    for p in ("a", "b"):
        ids = [f"{p}{i}" for i in range(4)]
        edges += [(u, v) for i, u in enumerate(ids) for v in ids[i + 1:]]
    edges += list(bridge)
    df = spark.createDataFrame(edges, ["src", "dst"])
    return LinkGraph(df, keys={"directed": False}), edges


def _dense_replay(edges, seed, t, n_terms):
    ids = sorted({u for e in edges for u in e})
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for u, v in edges:
        A[ix[u], ix[v]] = A[ix[v], ix[u]] = 1.0
    P = A / A.sum(axis=1, keepdims=True)  # row-stochastic random walk
    w = taylor_weights(t, n_terms)
    x = np.zeros(n)
    x[ix[seed]] = 1.0
    h = w[0] * x
    for k in range(1, n_terms + 1):
        x = P.T @ x  # mass pushed src -> dst, x_src / deg_src
        h = h + w[k] * x
    return {v: h[ix[v]] for v in ids}


def test_taylor_weights_sum():
    w = taylor_weights(5.0, 60)
    assert math.isclose(sum(w), 1.0, rel_tol=1e-12)


def test_matches_dense_replay(spark):
    g, edges = _two_cliques(spark)
    got = {r["id"]: r["hk"] for r in heat_kernel(g, "a0", t=3.0, n_terms=12).collect()}
    want = _dense_replay(edges, "a0", 3.0, 12)
    assert set(got) == {v for v, h in want.items() if h > 0}
    for v, h in got.items():
        assert abs(h - want[v]) < 1e-9, v


def test_mass_conservation(spark):
    # no dangling nodes in the undirected view -> sum(hk) = sum(weights)
    g, _ = _two_cliques(spark)
    rows = heat_kernel(g, "b1", t=5.0, n_terms=20).collect()
    assert math.isclose(
        sum(r["hk"] for r in rows), sum(taylor_weights(5.0, 20)), rel_tol=1e-9
    )


def test_cluster_recovers_seed_clique(spark):
    g, _ = _two_cliques(spark)
    rows = heat_kernel_cluster(g, "a0", t=5.0, n_terms=20).collect()
    assert {r["id"] for r in rows} == {"a0", "a1", "a2", "a3"}
    assert rows[0]["phi_millionths"] == round(1e6 / 13)


def test_param_validation(spark):
    g, _ = _two_cliques(spark)
    with pytest.raises(ValueError, match="t must be"):
        heat_kernel(g, "a0", t=0.0)
    with pytest.raises(ValueError, match="n_terms"):
        heat_kernel(g, "a0", n_terms=0)
