"""ACL local clustering (PPR sweep cut) — linkgraph/algorithms/local_cluster.py."""

import pytest

from linkgraph.algorithms.local_cluster import local_cluster
from linkgraph.graph import LinkGraph


def _two_cliques(spark, bridge=(("a0", "b0"),)):
    """Two 4-cliques a0-a3 / b0-b3 plus bridge edge(s)."""
    edges = []
    for p in ("a", "b"):
        ids = [f"{p}{i}" for i in range(4)]
        edges += [(u, v) for i, u in enumerate(ids) for v in ids[i + 1:]]
    edges += list(bridge)
    df = spark.createDataFrame(edges, ["src", "dst"])
    return LinkGraph(df, keys={"directed": False})


def test_recovers_seed_clique(spark):
    g = _two_cliques(spark)
    rows = local_cluster(g, "a0", max_iter=20).collect()
    assert {r["id"] for r in rows} == {"a0", "a1", "a2", "a3"}
    # cut=1, vol=13 -> phi = 1/13
    assert rows[0]["phi_millionths"] == round(1e6 / 13)
    # seed has the largest ppr/deg -> sweep_pos 0
    assert {r["id"]: r["sweep_pos"] for r in rows}["a0"] == 0


def test_other_seed_side(spark):
    g = _two_cliques(spark)
    rows = local_cluster(g, "b2", max_iter=20).collect()
    assert {r["id"] for r in rows} == {"b0", "b1", "b2", "b3"}


def test_support_guard(spark):
    g = _two_cliques(spark)
    with pytest.raises(ValueError, match="max_support"):
        local_cluster(g, "a0", max_iter=20, max_support=2)


def test_whole_graph_when_no_structure(spark):
    # single triangle: best prefix is any 1 node (phi = 2/2 = 1.0) vs
    # 2 nodes (cut 2, min-vol 2 -> 1.0); ties at phi take smallest prefix.
    df = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("x", "z")], ["src", "dst"]
    )
    g = LinkGraph(df, keys={"directed": False})
    rows = local_cluster(g, "x", max_iter=10).collect()
    assert len(rows) == 1 and rows[0]["id"] == "x"
    assert rows[0]["phi_millionths"] == 1_000_000
