import networkx as nx
import pytest

from linkgraph import LinkGraph, clique_percolation
from tests.fixtures import karate_edges


def _nx_graph(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    return g


def _communities(df):
    """set of frozensets of member ids, one per community label."""
    out = {}
    for r in df.collect():
        out.setdefault(r["community"], set()).add(r["id"])
    return {frozenset(v) for v in out.values()}


@pytest.mark.parametrize("k", [3, 4])
def test_cpm_matches_networkx_karate(spark, k):
    edges = karate_edges()
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    want = {
        frozenset(c)
        for c in nx.algorithms.community.k_clique_communities(
            _nx_graph(edges), k
        )
    }
    assert _communities(clique_percolation(g, k)) == want


def test_cpm_overlap_two_k4s_sharing_a_node(spark):
    # two K4s glued at node "m": their triangles share at most one node
    # (< k-1 = 2), so CPM(k=3) yields two communities overlapping at "m"
    a = ["a1", "a2", "a3", "m"]
    b = ["b1", "b2", "b3", "m"]
    edges = [(u, v) for grp in (a, b) for i, u in enumerate(grp)
             for v in grp[i + 1:]]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = clique_percolation(g, k=3)
    assert _communities(got) == {frozenset(a), frozenset(b)}
    # the shared node is a member of BOTH communities
    assert got.where(got.id == "m").count() == 2


def test_cpm_k2_is_components_of_nonisolated(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    nodes = spark.createDataFrame([(n,) for n in "abcxyz"], ["id"])
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]), nodes=nodes)
    got = _communities(clique_percolation(g, k=2))
    assert got == {frozenset({"a", "b", "c"}), frozenset({"x", "y"})}


def test_cpm_isolated_clique_is_singleton_community(spark):
    # one triangle with no neighbors: a single community of its 3 nodes
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]  # d: no triangle
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = clique_percolation(g, k=3)
    assert _communities(got) == {frozenset({"a", "b", "c"})}
    assert got.where(got.id == "d").count() == 0


def test_cpm_rejects_k1(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError):
        clique_percolation(g, k=1)
