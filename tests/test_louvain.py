"""Louvain — known global optimum (FIXTURES.md F3, reference
unit_tests/test_ml_louvain.py), duplicate-edge rejection, modularity value."""

import pytest

from linkgraph import LinkGraph
from linkgraph.algorithms.louvain import louvain_communities

# F3: expected partition {0,1,2}, {3,4,5}, {6,7,8}
F3_EDGES = [(1, 0, 1.0), (2, 1, 1.0), (3, 2, 1.0), (4, 3, 1.0),
            (5, 3, 1.0), (5, 4, 1.0), (7, 6, 1.0), (8, 6, 1.0)]


def _groups(labels_rows):
    by_cluster = {}
    for r in labels_rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["id"])
    return sorted(by_cluster.values(), key=lambda s: min(s))


def test_louvain_known_optimum(spark):
    df = spark.createDataFrame(F3_EDGES, ["src", "dst", "weight"])
    g = LinkGraph(df)
    res = louvain_communities(g, max_pass=2, max_iter=10)
    groups = _groups(res.labels.collect())
    assert groups == [{0, 1, 2}, {3, 4, 5}, {6, 7, 8}]
    assert -0.5 <= res.modularity <= 1.0
    # modularity of this partition: k_in/m − ΣK_c²/(2m)² = 7/8 − 90/256
    assert res.modularity == pytest.approx(0.5234375, abs=1e-9)


def test_louvain_duplicate_edges_raise(spark):
    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 0, 2.0)], ["src", "dst", "weight"]
    )
    with pytest.raises(ValueError, match="duplicated"):
        louvain_communities(LinkGraph(df))


def test_louvain_bad_resolution(spark):
    df = spark.createDataFrame(F3_EDGES, ["src", "dst", "weight"])
    with pytest.raises(ValueError, match="[Rr]esolution"):
        louvain_communities(LinkGraph(df), resolution=-1)


def test_louvain_all_partitions(spark):
    df = spark.createDataFrame(F3_EDGES, ["src", "dst", "weight"])
    res = louvain_communities(LinkGraph(df), all_partitions=True)
    assert "pass0" in res.labels.columns and "cluster" in res.labels.columns


def test_louvain_two_cliques_unweighted(spark):
    def clique(members):
        return [(a, b) for i, a in enumerate(members) for b in members[i + 1:]]

    edges = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(0, 10)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    res = louvain_communities(LinkGraph(df))
    groups = _groups(res.labels.collect())
    assert groups == [{0, 1, 2, 3}, {10, 11, 12, 13}]
