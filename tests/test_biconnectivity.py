"""Tarjan–Vishkin biconnectivity: networkx parity, cross-implementation
agreement, closed forms, contract guards."""

import random
from collections import defaultdict

import networkx as nx
import pytest

from linkgraph import LinkGraph
from linkgraph.algorithms.biconnectivity import (
    articulation_points_distributed,
    biconnected_components,
)


def _graph(spark, edges, directed=False, typ="long"):
    df = spark.createDataFrame(edges, f"src {typ}, dst {typ}")
    return LinkGraph(df, keys={"directed": directed})


def _blocks_of(rows):
    byblock = defaultdict(set)
    for r in rows:
        byblock[r["component"]].add((r["src"], r["dst"]))
    return {frozenset(s) for s in byblock.values()}


def _nx_blocks(g):
    return {
        frozenset((min(a, b), max(a, b)) for a, b in comp)
        for comp in nx.biconnected_component_edges(g)
    }


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_networkx_parity_random(spark, seed):
    rng = random.Random(seed)
    n = 22
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(36)
            for a, b in [(rng.randrange(n), rng.randrange(n))]
            if a != b
        }
    )
    g = nx.Graph(edges)
    sg = _graph(spark, edges)
    assert _blocks_of(biconnected_components(sg).collect()) == _nx_blocks(g)
    got_ap = sorted(
        r["id"] for r in articulation_points_distributed(sg).collect()
    )
    assert got_ap == sorted(nx.articulation_points(g))


def test_string_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("c", "e")]
    sg = _graph(spark, edges, typ="string")
    assert _blocks_of(biconnected_components(sg).collect()) == _nx_blocks(
        nx.Graph(edges)
    )
    assert [
        r["id"] for r in articulation_points_distributed(sg).collect()
    ] == ["c"]


def test_matches_driver_local_tarjan(spark):
    # Tarjan-Vishkin (distributed) vs the iterative lowlink DFS in cuts.py
    # — two independent algorithms, one articulation-point set
    from linkgraph.algorithms.cuts import articulation_points

    rng = random.Random(9)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(50)
            for a, b in [(rng.randrange(28), rng.randrange(28))]
            if a != b
        }
    )
    sg = _graph(spark, edges)
    got = sorted(r["id"] for r in articulation_points_distributed(sg).collect())
    want = sorted(r["id"] for r in articulation_points(sg).collect())
    assert got == want


def test_singleton_blocks_are_bridges(spark):
    # a block containing exactly one edge IS a bridge — cross-pin against
    # the XOR-sketch bridge finder on the same graph
    from linkgraph.algorithms.bridges import bridges

    rng = random.Random(5)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(30)
            for a, b in [(rng.randrange(20), rng.randrange(20))]
            if a != b
        }
    )
    sg = _graph(spark, edges)
    rows = biconnected_components(sg).collect()
    byblock = defaultdict(list)
    for r in rows:
        byblock[r["component"]].append((r["src"], r["dst"]))
    from_blocks = sorted(es[0] for es in byblock.values() if len(es) == 1)
    from_xor = sorted(tuple(r) for r in bridges(sg).collect())
    assert from_blocks == from_xor


def test_path_every_edge_own_block(spark):
    edges = [(i, i + 1) for i in range(5)]
    blocks = _blocks_of(biconnected_components(_graph(spark, edges)).collect())
    assert blocks == {frozenset([e]) for e in edges}
    aps = sorted(
        r["id"]
        for r in articulation_points_distributed(_graph(spark, edges)).collect()
    )
    assert aps == [1, 2, 3, 4]  # interior nodes only


def test_cycle_single_block_no_aps(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)]
    sg = _graph(spark, edges)
    rows = biconnected_components(sg).collect()
    assert len({r["component"] for r in rows}) == 1
    assert articulation_points_distributed(sg).collect() == []


def test_shared_vertex_two_blocks(spark):
    # two triangles sharing vertex 2: NO bridge, but 2 is an articulation
    # point and the triangles are separate blocks — the case edge-cut
    # methods cannot see
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    sg = _graph(spark, edges)
    blocks = _blocks_of(biconnected_components(sg).collect())
    assert blocks == {
        frozenset([(0, 1), (1, 2), (0, 2)]),
        frozenset([(2, 3), (3, 4), (2, 4)]),
    }
    assert [r["id"] for r in articulation_points_distributed(sg).collect()] == [2]


def test_directed_raises(spark):
    with pytest.raises(ValueError, match="undirected"):
        biconnected_components(_graph(spark, [(0, 1)], directed=True))


def test_empty_edges_typed(spark):
    df = spark.createDataFrame([], "src long, dst long")
    g = LinkGraph(
        df,
        nodes=spark.createDataFrame([(1,)], "id long"),
        keys={"directed": False},
    )
    assert biconnected_components(g).collect() == []
    assert articulation_points_distributed(g).collect() == []


def test_deterministic(spark):
    rng = random.Random(13)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(26)
            for a, b in [(rng.randrange(15), rng.randrange(15))]
            if a != b
        }
    )
    sg = _graph(spark, edges)
    r1 = sorted(map(tuple, biconnected_components(sg).collect()))
    r2 = sorted(map(tuple, biconnected_components(sg).collect()))
    assert r1 == r2


def test_tour_positions_path_and_star(spark):
    """List-ranking unit pin: on a rooted path the discovery order must be
    root->leaf and each retreat must come after every discovery below it;
    on a star all discoveries interleave with their own retreats."""
    from linkgraph.algorithms.biconnectivity import _tour_positions

    # path 0-1-2-3 rooted at 0
    arcs = spark.createDataFrame(
        [(a, b) for a, b in [(0, 1), (1, 2), (2, 3)]]
        + [(b, a) for a, b in [(0, 1), (1, 2), (2, 3)]],
        "u long, v long",
    )
    roots = spark.createDataFrame([(0,)], "id long")
    pos_df = _tour_positions(arcs, roots, 6)
    pos = {(r["au"], r["av"]): r["pos"] for r in pos_df.collect()}
    assert len(pos) == 6 and len(set(pos.values())) == 6
    # discovery order along the path, retreats in reverse
    assert pos[(0, 1)] < pos[(1, 2)] < pos[(2, 3)] < pos[(3, 2)] \
        < pos[(2, 1)] < pos[(1, 0)]

    # star centered at 0 with leaves 1,2,3: visit leaf k then retreat,
    # in sorted leaf order
    arcs = spark.createDataFrame(
        [(0, k) for k in (1, 2, 3)] + [(k, 0) for k in (1, 2, 3)],
        "u long, v long",
    )
    pos_df = _tour_positions(arcs, roots, 6)
    pos = {(r["au"], r["av"]): r["pos"] for r in pos_df.collect()}
    assert pos[(0, 1)] < pos[(1, 0)] < pos[(0, 2)] < pos[(2, 0)] \
        < pos[(0, 3)] < pos[(3, 0)]
