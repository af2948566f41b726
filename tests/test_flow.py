"""Unit-capacity Edmonds-Karp: networkx parity, cut validity, saturation,
directed support, guards."""

import random

import networkx as nx
import pytest

from linkgraph import LinkGraph
from linkgraph.algorithms.flow import min_st_cut, st_edge_connectivity


def _graph(spark, edges, directed=False):
    return LinkGraph(
        spark.createDataFrame(edges, "src long, dst long"),
        keys={"directed": directed},
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_networkx_parity_and_cut_validity(spark, seed):
    rng = random.Random(seed)
    n = 16
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(30)
            for a, b in [(rng.randrange(n), rng.randrange(n))]
            if a != b
        }
    )
    G = nx.Graph(edges)
    comp = max(nx.connected_components(G), key=len)
    s, t = sorted(comp)[0], sorted(comp)[-1]
    res = min_st_cut(_graph(spark, edges), s, t, max_flow_cap=16)
    want = nx.edge_connectivity(G, s, t)
    assert res.flow == want and not res.saturated
    cut = [tuple(r) for r in res.cut_edges.collect()]
    assert len(cut) == want
    # the returned edges must BE a cut: removing them separates s from t
    H = G.copy()
    H.remove_edges_from(cut)
    assert not nx.has_path(H, s, t)


def test_bridge_cut_is_the_bridge(spark):
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 10), (10, 11), (11, 3)]
    res = min_st_cut(_graph(spark, edges), 0, 4)
    assert res.flow == 1
    # Edmonds-Karp returns the SOURCE-SIDE minimum cut: the first bridge
    # leaving the residual-reachable set around s
    assert [tuple(r) for r in res.cut_edges.collect()] == [(2, 10)]


def test_cycle_two_disjoint_paths(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    assert st_edge_connectivity(_graph(spark, edges), 0, 2) == 2


def test_saturation_reports_honestly(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    res = min_st_cut(_graph(spark, k4), 0, 3, max_flow_cap=2)
    assert res.flow == 2 and res.saturated and res.cut_edges is None
    res = min_st_cut(_graph(spark, k4), 0, 3, max_flow_cap=8)
    assert res.flow == 3 and not res.saturated


def test_disconnected_zero_flow_empty_cut(spark):
    res = min_st_cut(_graph(spark, [(0, 1), (2, 3)]), 0, 3)
    assert res.flow == 0 and res.cut_edges.collect() == []


def test_directed_parity(spark):
    rng = random.Random(7)
    arcs = sorted(
        {
            (a, b)
            for _ in range(40)
            for a, b in [(rng.randrange(12), rng.randrange(12))]
            if a != b
        }
    )
    G = nx.DiGraph(arcs)
    s, t = 0, 11
    want = nx.edge_connectivity(G, s, t) if nx.has_path(G, s, t) else 0
    res = min_st_cut(_graph(spark, arcs, directed=True), s, t, max_flow_cap=16)
    assert res.flow == want
    if want:
        cut = [tuple(r) for r in res.cut_edges.collect()]
        assert len(cut) == want
        H = G.copy()
        H.remove_edges_from(cut)
        assert not nx.has_path(H, s, t)


def test_deterministic(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3)]
    g = _graph(spark, edges)
    c1 = sorted(map(tuple, min_st_cut(g, 1, 4).cut_edges.collect()))
    c2 = sorted(map(tuple, min_st_cut(g, 1, 4).cut_edges.collect()))
    assert c1 == c2


def test_guards(spark):
    g = _graph(spark, [(0, 1)])
    with pytest.raises(ValueError, match="s != t"):
        min_st_cut(g, 0, 0)
    with pytest.raises(ValueError, match="max_flow_cap"):
        min_st_cut(g, 0, 1, max_flow_cap=0)


@pytest.mark.parametrize("seed", [2, 6])
def test_vertex_connectivity_networkx_parity(spark, seed):
    from networkx.algorithms.connectivity import local_node_connectivity

    from linkgraph.algorithms.flow import st_vertex_connectivity

    rng = random.Random(seed)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(26)
            for a, b in [(rng.randrange(13), rng.randrange(13))]
            if a != b
        }
    )
    G = nx.Graph(edges)
    g = _graph(spark, edges)
    nodes = sorted(G.nodes)
    pairs = [(nodes[0], nodes[-1]), (nodes[1], nodes[-2])]
    for s, t in pairs:
        if s == t:
            continue
        want = local_node_connectivity(G, s, t)
        got = st_vertex_connectivity(g, s, t, max_flow_cap=16)
        assert got == want, (s, t)


def test_vertex_connectivity_articulation_point(spark):
    from linkgraph.algorithms.flow import st_vertex_connectivity

    # two triangles sharing vertex 2: every 0-4 path passes through 2
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    assert st_vertex_connectivity(_graph(spark, edges), 0, 4) == 1


def test_vertex_connectivity_guards(spark):
    from linkgraph.algorithms.flow import st_vertex_connectivity

    with pytest.raises(ValueError, match="s != t"):
        st_vertex_connectivity(_graph(spark, [(0, 1)]), 0, 0)


def test_max_flow_networkx_parity_directed(spark):
    from linkgraph.algorithms.flow import max_flow

    rng = random.Random(4)
    arcs = sorted(
        {
            (a, b)
            for _ in range(34)
            for a, b in [(rng.randrange(10), rng.randrange(10))]
            if a != b
        }
    )
    caps = {(a, b): rng.randrange(1, 9) for a, b in arcs}
    df = spark.createDataFrame(
        [(a, b, c) for (a, b), c in caps.items()],
        "src long, dst long, weight long",
    )
    g = LinkGraph(df, keys={"directed": True})
    G = nx.DiGraph()
    for (a, b), c in caps.items():
        G.add_edge(a, b, capacity=c)
    s, t = 0, 9
    want = nx.maximum_flow_value(G, s, t) if nx.has_path(G, s, t) else 0
    res = max_flow(g, s, t)
    assert res.flow == want
    assert res.cut_capacity == want  # LP duality, computed independently
    # cut validity: removing the crossing arcs kills all s->t paths
    H = G.copy()
    H.remove_edges_from(
        [(r["src"], r["dst"]) for r in res.cut_edges.collect()]
    )
    assert not nx.has_path(H, s, t)


def test_max_flow_undirected_parity(spark):
    from linkgraph.algorithms.flow import max_flow

    und = [(0, 1, 3), (1, 2, 2), (0, 2, 1), (2, 3, 4), (1, 3, 1)]
    df = spark.createDataFrame(und, "src long, dst long, weight long")
    g = LinkGraph(df, keys={"directed": False})
    G = nx.Graph()
    for a, b, c in und:
        G.add_edge(a, b, capacity=c)
    assert max_flow(g, 0, 3).flow == nx.maximum_flow_value(G, 0, 3)


def test_max_flow_guards(spark):
    from linkgraph.algorithms.flow import max_flow

    df = spark.createDataFrame([(0, 1, 1.5)], "src long, dst long, weight double")
    g = LinkGraph(df, keys={"directed": True})
    with pytest.raises(ValueError, match="integer capacities"):
        max_flow(g, 0, 1)
    df2 = spark.createDataFrame([(0, 1, 2)], "src long, dst long, weight long")
    g2 = LinkGraph(df2, keys={"directed": True})
    with pytest.raises(ValueError, match="capacity column"):
        max_flow(g2, 0, 1, capacity_col="nope")
    with pytest.raises(ValueError, match="s != t"):
        max_flow(g2, 0, 0)


def test_max_flow_saturation(spark):
    from linkgraph.algorithms.flow import max_flow

    # two parallel routes: full answer needs 2 augmentations
    arcs = [(0, 1, 5), (1, 3, 5), (0, 2, 5), (2, 3, 5)]
    df = spark.createDataFrame(arcs, "src long, dst long, weight long")
    g = LinkGraph(df, keys={"directed": True})
    res = max_flow(g, 0, 3, max_augmentations=1)
    assert res.saturated and res.flow == 5 and res.cut_edges is None
    assert max_flow(g, 0, 3).flow == 10


def test_walk_back_is_one_collect_and_log_jobs(spark):
    # Round-4 verdict scale finding #2: the t->s walk-back used one
    # single-row collect per hop (O(depth) full-table filter jobs per
    # augmentation). The pointer-doubling closure must recover a 40-hop
    # path in O(log depth) jobs, correctly.
    from linkgraph.algorithms.flow import _augmenting_path
    from linkgraph.session import static_plans

    depth = 40
    # parent chain 0 <- 1 <- ... <- 40 (settled[id, parent]; source=0)
    rows = [(0, None)] + [(i, i - 1) for i in range(1, depth + 1)]
    settled = spark.createDataFrame(rows, "id long, parent long")

    sc = spark.sparkContext
    sc.setJobGroup("walkback", "pointer-doubling walk-back")
    try:
        # production call sites (min_st_cut / max_flow) run under
        # static_plans: AQE's per-stage job splitting is off
        with static_plans(spark):
            path = _augmenting_path(settled, 0, depth, "long", depth)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("walkback")
    # exact chain, t->s orientation: [(parent, child), ...] from t down
    assert path == [(depth - 1 - i, depth - i) for i in range(depth)]
    # doubling: ceil(log2(41)) - 1 = 5 squaring checkpoints + 1 collect
    # (+ broadcast materializations). The old per-hop walk issued one
    # full-table filter job PER HOP (>= 40).
    assert len(jobs) < 15, len(jobs)


def test_walk_back_detects_broken_parent_table(spark):
    from linkgraph.algorithms.flow import _augmenting_path

    # chain missing its middle link: closure cannot span offset 2
    settled = spark.createDataFrame(
        [(0, None), (2, 1)], "id long, parent long"
    )
    with pytest.raises(RuntimeError, match="inconsistent"):
        _augmenting_path(settled, 0, 2, "long", 2)


def test_truncated_bfs_raises_instead_of_fake_cut(spark):
    # round-5 review: a too-small max_hops used to return reached=False,
    # letting the truncated settled set masquerade as a proven minimum
    # cut (flow=0 "disconnected" plus a nonempty cut, on a connected pair)
    from linkgraph import LinkGraph
    from linkgraph.algorithms.flow import min_st_cut

    e = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("b", "t")], ["src", "dst"]
    )
    g = LinkGraph(e, keys={"directed": False})
    with pytest.raises(ValueError, match="hop budget"):
        min_st_cut(g, "s", "t", max_hops=2)
    # the default budget (node count) still proves the true cut
    res = min_st_cut(g, "s", "t")
    assert res.flow == 1 and res.saturated is False
