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


def test_louvain_checkpoint_resume_equivalence(spark, tmp_ckpt):
    """Louvain interrupted mid-pass (max_supersteps budget as the kill
    switch) and resumed must produce bit-exact labels AND modularity vs an
    uninterrupted run — the fourth resumable loop (BASELINE.json:14) after
    pagerank, two-star CC and LPA. Deterministic tie-breaks make the whole
    cross-pass state (edges, ret, p1, scalars) sufficient for exactness."""
    from linkgraph.checkpoint import CheckpointManager

    def clique(members):
        return [(a, b) for i, a in enumerate(members) for b in members[i + 1:]]

    edges = (clique(list(range(5))) + clique(list(range(10, 15)))
             + clique(list(range(20, 24))) + [(0, 10), (10, 20)])
    df = spark.createDataFrame(edges, ["src", "dst"])
    g = LinkGraph(df)

    full = louvain_communities(g)
    mgr = CheckpointManager(tmp_ckpt, spark)
    # interrupt after 1 global inner iteration (simulates a killed run)
    partial = louvain_communities(
        g, checkpoint=mgr, checkpoint_interval=1, max_supersteps=1
    )
    assert mgr.latest_step() == 1
    man = mgr.manifest(1)
    assert man["metrics"]["done"] is False
    assert man["metrics"]["history"][0]["moved"] > 0
    assert man["tables"]["p1"]["partition_rows"]  # per-partition lineage
    # the killed run hands back only completed-pass labels (pass0 identity)
    assert partial.passes == 0

    resumed = louvain_communities(g, checkpoint=mgr, resume=True)
    assert resumed.modularity == full.modularity
    assert resumed.passes == full.passes
    a = sorted(full.labels.collect())
    b = sorted(resumed.labels.collect())
    assert a == b
    # resume from a done snapshot recomputes nothing and matches again
    last = mgr.latest_step()
    assert mgr.manifest(last)["metrics"]["done"] is True
    again = louvain_communities(g, checkpoint=mgr, resume=True)
    assert sorted(again.labels.collect()) == a
    assert again.modularity == full.modularity
