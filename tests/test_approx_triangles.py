"""DOULION approximate triangle counting — determinism, p=1 exactness,
estimate scaling, and the weighted-PageRank oracle's weight sensitivity."""

import itertools

import pytest

from linkgraph import LinkGraph, pagerank, triangle_count
from linkgraph.algorithms.triangles import approx_triangle_count


def _k(n):
    return [
        (f"v{i:02d}", f"v{j:02d}") for i, j in itertools.combinations(range(n), 2)
    ]


def test_p1_equals_exact(spark):
    g = LinkGraph(spark.createDataFrame(_k(12), ["src", "dst"]))
    exact = triangle_count(g)
    sampled, est = approx_triangle_count(g, p=1.0, seed=7)
    assert sampled == exact == 220
    assert est == exact


def test_deterministic_across_partitionings(spark):
    edges = spark.createDataFrame(_k(16), ["src", "dst"])
    a = approx_triangle_count(LinkGraph(edges.repartition(1)), p=0.5, seed=42)
    b = approx_triangle_count(LinkGraph(edges.repartition(13)), p=0.5, seed=42)
    assert a == b


def test_seed_changes_sample(spark):
    g = LinkGraph(spark.createDataFrame(_k(16), ["src", "dst"]))
    counts = {approx_triangle_count(g, p=0.5, seed=s)[0] for s in range(4)}
    assert len(counts) > 1  # different coins -> different samples


def test_estimate_scaling(spark):
    g = LinkGraph(spark.createDataFrame(_k(16), ["src", "dst"]))
    sampled, est = approx_triangle_count(g, p=0.5, seed=42)
    assert est == sampled * 8


def test_invalid_p_raises(spark):
    g = LinkGraph(spark.createDataFrame(_k(4), ["src", "dst"]))
    with pytest.raises(ValueError):
        approx_triangle_count(g, p=0.0)
    with pytest.raises(ValueError):
        approx_triangle_count(g, p=1.5)


def test_weighted_pagerank_differs_from_uniform(spark):
    # star a->{b,c} with weights 3:1 — weighted ranks must split 3:1 toward
    # b after one superstep, so b > c; a uniform implementation gives b == c
    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        ["src", "dst", "weight"],
    )
    res = pagerank(LinkGraph(edges), tol=0.0, max_iter=3)
    r = {row["id"]: row["pagerank"] for row in res.ranks.collect()}
    assert r["b"] > r["c"]
