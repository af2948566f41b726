"""Link-prediction scores parity vs networkx, cap semantics, plan shape."""

import math

import networkx as nx
import pytest

from linkgraph import LinkGraph, link_prediction_scores
from tests.fixtures import random_digraph


def _nx_graph(edges):
    g = nx.Graph()
    g.add_edges_from((s, d) for s, d, *_ in edges if s != d)
    return g


def _collect(df):
    return {
        (r["u"], r["v"]): (r["common"], r["jaccard"], r["adamic_adar"])
        for r in df.collect()
    }


def test_scores_networkx_parity(spark):
    edges = random_digraph(50, 0.08, seed=7)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    got = _collect(link_prediction_scores(g))
    nxg = _nx_graph(edges)
    pairs = list(got)
    assert pairs, "test graph produced no 2-hop non-edges"
    jac = {(u, v): p for u, v, p in nx.jaccard_coefficient(nxg, pairs)}
    aa = {(u, v): p for u, v, p in nx.adamic_adar_index(nxg, pairs)}
    for (u, v), (common, j, a) in got.items():
        assert not nxg.has_edge(u, v)  # exclude_edges
        assert common == len(list(nx.common_neighbors(nxg, u, v)))
        assert j == pytest.approx(jac[(u, v)], abs=1e-12)
        assert a == pytest.approx(aa[(u, v)], abs=1e-12)
    # completeness: every non-adjacent 2-hop pair with >=1 common nbr shows up
    expected = {
        tuple(sorted((u, v)))
        for u in nxg
        for v in nxg
        if u < v
        and not nxg.has_edge(u, v)
        and len(list(nx.common_neighbors(nxg, u, v)))
    }
    assert set(got) == expected


def test_include_edges_and_min_common(spark):
    # square a-b-c-d-a plus diagonal a-c: pair (b,d) has common {a,c}
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    all_pairs = _collect(link_prediction_scores(g, exclude_edges=False))
    # existing edge (a, c) scored too: common nbrs {b, d}
    assert all_pairs[("a", "c")][0] == 2
    only_new = _collect(link_prediction_scores(g))
    assert ("a", "c") not in only_new
    assert only_new[("b", "d")][0] == 2
    # jaccard for (b,d): deg b=2, deg d=2, common 2 -> 2/(2+2-2)=1.0
    assert only_new[("b", "d")][1] == pytest.approx(1.0)
    # adamic-adar: a and c both have degree 3 -> 2/ln 3
    assert only_new[("b", "d")][2] == pytest.approx(2.0 / math.log(3.0))
    assert _collect(link_prediction_scores(g, min_common=3)) == {}
    # method wrapper parity
    assert _collect(g.link_prediction()) == only_new


def test_max_neighbor_degree_caps_wedges_not_jaccard_degrees(spark):
    # hub h adjacent to x0..x4; x0-x1 also share low-degree w
    edges = [("h", f"x{i}") for i in range(5)] + [("w", "x0"), ("w", "x1")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    capped = _collect(link_prediction_scores(g, max_neighbor_degree=2))
    # wedges through h (deg 5) dropped: (x0,x1) survives only via w; the
    # (h,w) pair survives via x0/x1 (deg 2, under the cap); all (xi,xj)
    # pairs whose only wedge is h disappear
    assert set(capped) == {("x0", "x1"), ("h", "w")}
    assert capped[("h", "w")][0] == 2
    common, j, a = capped[("x0", "x1")]
    assert common == 1
    # jaccard denominator uses FULL degrees (x0: {h,w}=2, x1: 2) -> 1/3
    assert j == pytest.approx(1.0 / 3.0)
    assert a == pytest.approx(1.0 / math.log(2.0))
    uncapped = _collect(link_prediction_scores(g))
    assert uncapped[("x0", "x1")][0] == 2  # h and w both common


def test_no_window_in_plan(spark):
    from linkgraph.algorithms.linkpred import _scores_lazy

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    df, cached = _scores_lazy(g, None, True, 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for c in cached:
        c.unpersist()
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_top_k_per_node(spark):
    from linkgraph import link_prediction_top_k

    # K4 minus edge (a,d): (a,d) has common {b,c}=2; (b,c) is an edge so
    # excluded; remaining candidate pairs all have known common counts
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    top = link_prediction_top_k(g, k=5, score="common")
    rows = {(r["node"], r["candidate"]): (r["rank"], r["common"])
            for r in top.collect()}
    # only non-edge 2-hop pair is (a,d) -> appears in BOTH endpoint lists
    assert rows == {("a", "d"): (1, 2), ("d", "a"): (1, 2)}


def test_top_k_cutoff_and_tiebreak(spark):
    from linkgraph import link_prediction_top_k

    # star: center s, leaves l1..l4 — every leaf pair shares exactly {s};
    # per-leaf candidate lists are the other 3 leaves, all tied on
    # common=1, so rank order must be candidate-ascending; k=2 truncates
    edges = [("s", f"l{i}") for i in range(1, 5)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    top = link_prediction_top_k(g, k=2, score="common")
    by_node = {}
    for r in top.collect():
        by_node.setdefault(r["node"], []).append((r["rank"], r["candidate"]))
    for node, lst in by_node.items():
        assert len(lst) == 2
        cands = [c for _, c in sorted(lst)]
        expected = sorted(x for x in ["l1", "l2", "l3", "l4"] if x != node)[:2]
        assert cands == expected
    assert set(by_node) == {"l1", "l2", "l3", "l4"}


def test_top_k_score_validation(spark):
    from linkgraph import link_prediction_top_k

    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError, match="unknown score"):
        link_prediction_top_k(g, score="pagerank")
    with pytest.raises(ValueError, match="k must be"):
        link_prediction_top_k(g, k=0)


def test_resource_alloc_and_pref_attach(spark):
    from linkgraph import LinkGraph, link_prediction_scores

    # square a-w1-b, a-w2-b: common=2; w degrees both 2 -> ra = 1.0;
    # deg(a)=deg(b)=2 -> pa = 4
    edges = [("a", "w1"), ("w1", "b"), ("a", "w2"), ("w2", "b")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    rows = {
        (r["u"], r["v"]): r
        for r in link_prediction_scores(g).collect()
    }
    ab = rows[("a", "b")]
    assert ab["resource_alloc"] == 1.0
    assert ab["pref_attach"] == 4
    w12 = rows[("w1", "w2")]  # via a and b, each degree 2
    assert w12["resource_alloc"] == 1.0 and w12["pref_attach"] == 4


def test_top_k_by_new_scores_and_validation(spark):
    import pytest

    from linkgraph import LinkGraph, link_prediction_top_k

    edges = [("a", "w"), ("w", "b"), ("a", "x"), ("x", "c")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    top = link_prediction_top_k(g, k=1, score="pref_attach")
    assert {"resource_alloc", "pref_attach"} <= set(top.columns)
    with pytest.raises(ValueError):
        link_prediction_top_k(g, k=1, score="katz")
