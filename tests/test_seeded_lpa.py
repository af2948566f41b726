"""Seeded (semi-supervised) label propagation: python sync simulator +
closed forms for clamping, tie-breaks, and unreachable nodes."""

import random

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph, seeded_label_propagation


def _g(spark, edges):
    return LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]), keys={"directed": False}
    )


def _seeds(spark, mapping):
    return spark.createDataFrame(list(mapping.items()), ["id", "label"])


def _py_seeded(edges, seeds, max_iter=30):
    """Synchronous reference: clamped seeds, most-frequent neighbor label,
    ties min; unlabeled neighbors contribute nothing."""
    import collections

    adj = collections.defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    labels = dict(seeds)
    for _ in range(max_iter):
        nxt = dict(seeds)
        for node in adj:
            if node in seeds:
                continue
            votes = collections.Counter(
                labels[n] for n in adj[node] if n in labels
            )
            if votes:
                best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                nxt[node] = best[0]
        if nxt == labels:
            return labels
        labels = nxt
    return labels


def test_two_hub_split_and_unreachable(spark):
    # two 3-node stars bridged nowhere; an isolated pair stays unlabeled
    edges = [
        ("h1", "a"), ("h1", "b"),
        ("h2", "c"), ("h2", "d"),
        ("x", "y"),
    ]
    g = _g(spark, edges)
    out = {
        r["id"]: r["label"]
        for r in seeded_label_propagation(
            g, _seeds(spark, {"h1": "L", "h2": "R"})
        ).collect()
    }
    assert out == {"h1": "L", "h2": "R", "a": "L", "b": "L", "c": "R", "d": "R"}


def test_seed_clamping_beats_neighbors(spark):
    # seed 's' is surrounded by opposite-label nodes after spreading, but
    # stays clamped
    edges = [("s", "m"), ("m", "t"), ("t", "u")]
    out = {
        r["id"]: r["label"]
        for r in seeded_label_propagation(
            _g(spark, edges), _seeds(spark, {"s": "B", "t": "A"})
        ).collect()
    }
    assert out["s"] == "B" and out["t"] == "A"
    # m hears B (from s) and A (from t): tie -> min label A
    assert out["m"] == "A"
    assert out["u"] == "A"


def test_random_vs_python(spark):
    rng = random.Random(23)
    nodes = [f"n{i}" for i in range(24)]
    edges = list(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    seeds = {"n0": "red", "n1": "blue", "n2": "green"}
    want = _py_seeded(edges, seeds)
    got = {
        r["id"]: r["label"]
        for r in seeded_label_propagation(
            _g(spark, edges), _seeds(spark, seeds), max_iter=30
        ).collect()
    }
    assert got == want


def test_phantom_seed_dropped(spark):
    out = seeded_label_propagation(
        _g(spark, [("a", "b")]), _seeds(spark, {"zz": "X"})
    )
    assert out.count() == 0


def test_duplicate_seed_ids_resolve_and_converge(spark):
    # review regression: duplicate seed ids with conflicting labels used to
    # defeat the convergence scan (delta never 0, full max_iter burned);
    # now they resolve deterministically to the min label up front
    g = _g(spark, [("s", "a"), ("a", "b")])
    seeds = spark.createDataFrame(
        [("s", "Z"), ("s", "A")], ["id", "label"]
    )
    out = {
        r["id"]: r["label"]
        for r in seeded_label_propagation(g, seeds, max_iter=5).collect()
    }
    assert out == {"s": "A", "a": "A", "b": "A"}
