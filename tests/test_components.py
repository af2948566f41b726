"""Connected components — exact up to relabeling vs networkx oracle
(BASELINE.json:6), both methods, directed treated as undirected."""

import networkx as nx
import pytest

from linkgraph import LinkGraph, connected_components
from tests.fixtures import random_digraph


def _nx_components(edges, nodes=None):
    g = nx.Graph()
    if nodes:
        g.add_nodes_from(nodes)
    g.add_edges_from([(e[0], e[1]) for e in edges])
    out = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for v in comp:
            out[v] = (root, len(comp))
    return out


def _ours(spark, edges, method, nodes=None, cols=("src", "dst")):
    df = spark.createDataFrame([e[: len(cols)] for e in edges], list(cols))
    ndf = spark.createDataFrame([(x,) for x in nodes], ["id"]) if nodes else None
    g = LinkGraph(df, nodes=ndf)
    # method parametrization targets the distributed algorithms — pin the
    # strategy so the auto gate doesn't reroute these tiny graphs
    res = connected_components(g, method=method, strategy="distributed")
    return {r["id"]: (r["component"], r["component_size"]) for r in res.collect()}


@pytest.mark.parametrize("method", ["two_star", "min_label"])
def test_simple_two_components(spark, method):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    got = _ours(spark, edges, method, nodes=["a", "b", "c", "x", "y", "lonely"])
    ref = _nx_components(edges, nodes=["a", "b", "c", "x", "y", "lonely"])
    assert got == ref
    assert got["lonely"] == ("lonely", 1)


@pytest.mark.parametrize("method", ["two_star", "min_label"])
@pytest.mark.parametrize("seed", [1, 2])
def test_random_graphs_match_networkx(spark, method, seed):
    # sparse → many components; directed edges must be treated as undirected
    edges = random_digraph(120, 0.012, seed=seed)
    nodes = list(range(120))
    got = _ours(spark, edges, method, nodes=nodes)
    ref = _nx_components(edges, nodes=nodes)
    assert got == ref


def test_long_path_two_star(spark):
    # path graph: worst case for min-label, fine for two_star's O(log^2 n)
    edges = [(i, i + 1) for i in range(200)]
    got = _ours(spark, edges, "two_star")
    assert all(v == (0, 201) for v in got.values())


def test_local_strategy_matches_distributed(spark):
    """The driver-local numpy plan and the two-star loop are two physical
    plans for one logical operator — identical labels and sizes."""
    for seed in (1, 2):
        edges = random_digraph(120, 0.012, seed=seed)
        df = spark.createDataFrame(edges, ["src", "dst", "weight"])
        g = LinkGraph(df)
        loc = {
            r["id"]: (r["component"], r["component_size"])
            for r in connected_components(g, strategy="local").collect()
        }
        dist = {
            r["id"]: (r["component"], r["component_size"])
            for r in connected_components(g, strategy="distributed").collect()
        }
        assert loc == dist


def test_local_strategy_bridging_endpoint(spark):
    """An edge endpoint outside the node set still bridges components (its
    pair rows exist in two-star; only its output row is dropped) — the local
    plan must reproduce that."""
    edges = [("b", "X"), ("X", "c")]  # X not a node; bridges b and c
    df = spark.createDataFrame(edges, ["src", "dst"])
    ndf = spark.createDataFrame([("b",), ("c",)], ["id"])
    g = LinkGraph(df, nodes=ndf)
    loc = {
        r["id"]: r["component"]
        for r in connected_components(g, strategy="local").collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in connected_components(g, strategy="distributed").collect()
    }
    assert loc == dist
    assert loc["b"] == loc["c"]


def test_cc_strategy_validation(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError):
        connected_components(g, strategy="nope")


def test_cc_checkpoint_resume_equivalence(spark, tmp_ckpt):
    """Two-star interrupted mid-round and resumed must produce bit-exact
    labels vs an uninterrupted run (BASELINE.json:14 resumability, extended
    beyond pagerank per VERDICT r3 item 6)."""
    from linkgraph.checkpoint import CheckpointManager

    edges = random_digraph(60, 0.05, seed=13)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))

    full = connected_components(g, strategy="distributed", with_sizes=False)
    mgr = CheckpointManager(tmp_ckpt, spark)
    # interrupt after 1 round (max_iter=1 simulates a killed run)
    connected_components(g, max_iter=1, checkpoint=mgr,
                         checkpoint_interval=1, with_sizes=False)
    assert mgr.latest_step() == 1
    man = mgr.manifest(1)
    assert "fingerprint" in man["metrics"] and "pairs" in man["tables"]
    assert man["tables"]["pairs"]["partition_rows"]  # per-partition lineage

    resumed = connected_components(g, checkpoint=mgr, resume=True,
                                   with_sizes=False)
    a = {r["id"]: r["component"] for r in full.collect()}
    b = {r["id"]: r["component"] for r in resumed.collect()}
    assert a == b
    # resume from a converged snapshot is a no-iteration label derivation
    last = mgr.latest_step()
    assert mgr.manifest(last)["metrics"]["converged"]
    again = connected_components(g, checkpoint=mgr, resume=True,
                                 with_sizes=False)
    assert {r["id"]: r["component"] for r in again.collect()} == a


def test_cc_checkpoint_gate_errors(spark):
    from linkgraph.checkpoint import CheckpointManager

    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError, match="local"):
        connected_components(g, strategy="local", resume=True)
    with pytest.raises(ValueError, match="two_star"):
        connected_components(g, method="min_label",
                             checkpoint=CheckpointManager("/tmp/_x", spark))


def test_cc_warm_labels_additive_equivalence(spark):
    """Warm labels on an additively grown graph must reproduce the cold
    labels exactly — across both methods and the local gate."""
    from pyspark.sql import functions as F

    from linkgraph import LinkGraph, connected_components

    # yesterday: two paths a0-..-a9 and b0-..-b9
    old_edges = [(f"a{i}", f"a{i+1}") for i in range(9)] + [
        (f"b{i}", f"b{i+1}") for i in range(9)
    ]
    g_old = LinkGraph(spark.createDataFrame(old_edges, ["src", "dst"]))
    labels_old = connected_components(g_old, with_sizes=False)

    # today: a new node c0 bridges the two paths
    new_edges = old_edges + [("a9", "c0"), ("c0", "b0")]
    g_new = LinkGraph(spark.createDataFrame(new_edges, ["src", "dst"]))
    cold = {
        r["id"]: r["component"]
        for r in connected_components(g_new, with_sizes=False).collect()
    }
    for method in ("two_star", "min_label"):
        for strategy in ("local", "distributed"):
            warm = {
                r["id"]: r["component"]
                for r in connected_components(
                    g_new,
                    method=method,
                    strategy=strategy,
                    with_sizes=False,
                    initial_labels=labels_old,
                ).collect()
            }
            assert warm == cold, (method, strategy)
    assert set(cold.values()) == {"a0"}  # everything merged, min id a0
    # sizes path still works with warm labels
    sized = connected_components(g_new, initial_labels=labels_old)
    assert sized.filter(F.col("component_size") != 21).count() == 0


def test_cc_warm_start_rejects_resume(spark, tmp_path):
    """initial_labels + resume is a contradiction (the resumed snapshot
    replays the checkpointed pair table and never reads the shortcut
    edges) — must raise, mirroring pagerank's initial_ranks+resume guard."""
    from linkgraph.checkpoint import CheckpointManager

    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    labels = spark.createDataFrame([("a", "a"), ("b", "a")], ["id", "component"])
    mgr = CheckpointManager(str(tmp_path / "cc_ck"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        connected_components(g, initial_labels=labels, checkpoint=mgr, resume=True)
