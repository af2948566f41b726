"""Feature propagation: numpy reference + closed forms + round-trip."""

import random

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph
from linkgraph.algorithms.feature_prop import (
    assemble_features,
    explode_features,
    feature_propagation,
)


def _py_prop(edges, feats, iterations, alpha):
    import collections

    cur = {k: list(v) for k, v in feats.items()}
    inn = collections.defaultdict(list)
    for u, v in edges:
        inn[v].append(u)
    for _ in range(iterations):
        nxt = {}
        for node, vec in cur.items():
            srcs = [cur[u] for u in inn.get(node, []) if u in cur]
            if srcs:
                d = len(vec)
                mean = [sum(s[i] for s in srcs) / len(srcs) for i in range(d)]
                nxt[node] = [
                    (1 - alpha) * vec[i] + alpha * mean[i] for i in range(d)
                ]
            else:
                nxt[node] = list(vec)
        cur = nxt
    return cur


def _setup(spark, edges, feats):
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    fdf = spark.createDataFrame(
        [(k, v) for k, v in feats.items()], ["id", "features"]
    )
    return g, fdf


def test_chain_closed_form(spark):
    g, fdf = _setup(
        spark, [("a", "b")], {"a": [4.0, 0.0], "b": [0.0, 8.0]}
    )
    out = {
        r["id"]: r["features"]
        for r in feature_propagation(g, fdf, iterations=1, alpha=0.5).collect()
    }
    assert out["a"] == [4.0, 0.0]           # no in-neighbors: unchanged
    assert out["b"] == [2.0, 4.0]           # 0.5*own + 0.5*a


def test_random_vs_python(spark):
    rng = random.Random(5)
    nodes = [f"n{i}" for i in range(12)]
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(40)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    feats = {n: [float(rng.randint(-5, 5)) for _ in range(3)] for n in nodes}
    g, fdf = _setup(spark, edges, feats)
    want = _py_prop(edges, feats, 3, 0.3)
    got = {
        r["id"]: r["features"]
        for r in feature_propagation(g, fdf, iterations=3, alpha=0.3).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_zero_iterations_identity_and_roundtrip(spark):
    g, fdf = _setup(spark, [("a", "b")], {"a": [1.0, 2.0], "b": [3.0, 4.0]})
    out = {
        r["id"]: r["features"]
        for r in feature_propagation(g, fdf, iterations=0).collect()
    }
    assert out == {"a": [1.0, 2.0], "b": [3.0, 4.0]}
    # explode/assemble round-trip preserves dim order
    back = {
        r["id"]: r["features"]
        for r in assemble_features(explode_features(fdf)).collect()
    }
    assert back == {"a": [1.0, 2.0], "b": [3.0, 4.0]}


def test_long_layout_and_guards(spark):
    g, fdf = _setup(spark, [("a", "b")], {"a": [1.0], "b": [2.0]})
    long_out = feature_propagation(g, fdf, iterations=1, assemble=False)
    assert set(long_out.columns) == {"id", "dim", "value"}
    with pytest.raises(ValueError):
        feature_propagation(g, fdf, iterations=-1)
    with pytest.raises(ValueError):
        feature_propagation(g, fdf, alpha=1.5)
