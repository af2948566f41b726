"""Strongly connected components — cycles, DAGs, self-loops, and exact
parity between the driver-local Tarjan and the distributed
trim+coloring+backward-reach plan."""

import pytest

from linkgraph import LinkGraph, strongly_connected_components


def _labels(df):
    return {r["id"]: r["scc"] for r in df.collect()}


def test_two_cycles_one_bridge(spark):
    # cycle {1,2,3} -> bridge -> cycle {10,11}; both SCCs get min-id labels
    edges = [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 10)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    lab = _labels(strongly_connected_components(g))
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dag_all_singletons(spark):
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    lab = _labels(strongly_connected_components(g))
    assert lab == {i: i for i in range(1, 6)}


def test_self_loop_and_isolated(spark):
    nodes = spark.createDataFrame([(1,), (2,), (9,)], ["id"])
    edges = spark.createDataFrame([(1, 1), (1, 2)], ["src", "dst"])
    g = LinkGraph(edges, nodes=nodes)
    lab = _labels(strongly_connected_components(g))
    assert lab == {1: 1, 2: 2, 9: 9}


def test_cycle_with_chord_and_tail(spark):
    # chord keeps one 4-cycle SCC; tail nodes are singletons
    edges = [(5, 6), (6, 7), (7, 8), (8, 5), (6, 8), (8, 9), (9, 10)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    lab = _labels(strongly_connected_components(g))
    assert lab == {5: 5, 6: 5, 7: 5, 8: 5, 9: 9, 10: 10}


def test_with_sizes(spark):
    edges = [(1, 2), (2, 1), (2, 3)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    rows = {
        r["id"]: (r["scc"], r["scc_size"])
        for r in strongly_connected_components(g, with_sizes=True).collect()
    }
    assert rows == {1: (1, 2), 2: (1, 2), 3: (3, 1)}


def test_local_vs_distributed_parity(spark):
    # nested cycles + DAG periphery + string ids (coloring min over strings)
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),          # SCC {a,b,c}
        ("c", "d"), ("d", "e"), ("e", "d"),          # SCC {d,e}
        ("e", "f"), ("f", "g"),                      # tail singletons
        ("h", "a"),                                  # source singleton
        ("g", "g"),                                  # self loop
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    g = LinkGraph(df)
    loc = _labels(strongly_connected_components(g, strategy="local"))
    dist = _labels(strongly_connected_components(g, strategy="distributed"))
    assert loc == dist
    assert dist == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d",
                    "f": "f", "g": "g", "h": "h"}


def test_budget_exhaustion_raises(spark):
    edges = [(i, i + 1) for i in range(20)] + [(20, 0)]  # 21-cycle
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    with pytest.raises(RuntimeError, match="max_iter"):
        strongly_connected_components(g, strategy="distributed", max_iter=3)


def test_graph_method(spark):
    edges = [(1, 2), (2, 1)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    lab = _labels(g.strongly_connected_components())
    assert lab == {1: 1, 2: 1}


def test_checkpoint_resume_bit_exact(spark, tmp_path):
    """Kill after round 1 via max_rounds budget, resume, compare with an
    uninterrupted run — bit-exact labels (peeling is deterministic)."""
    from linkgraph.checkpoint import CheckpointManager

    # two 4-cycles A={1..4}, B={10..13} joined by a bridge: coloring paints
    # both with min(A), backward reach peels only A in round 1, so the run
    # genuinely needs two rounds
    cyc = lambda ns: [(ns[i], ns[(i + 1) % len(ns)]) for i in range(len(ns))]
    edges = cyc([1, 2, 3, 4]) + cyc([10, 11, 12, 13]) + [(4, 10)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    full = _labels(strongly_connected_components(g, strategy="distributed"))
    assert full == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10}

    mgr = CheckpointManager(str(tmp_path / "scc_ckpt"), spark)
    partial = strongly_connected_components(
        g, checkpoint=mgr, checkpoint_interval=1, max_rounds=1
    )
    # step index is the global superstep count (monotonic across both
    # round-granular and mid-phase saves); round progress lives in metrics
    step = mgr.latest_step()
    met = mgr.manifest(step)["metrics"]
    assert met["done"] is False and met["stats"]["rounds"] == 1
    # partial = only the round-1 peel (cycle A); B still unassigned
    assert _labels(partial) == {1: 1, 2: 1, 3: 1, 4: 1}

    resumed = strongly_connected_components(g, checkpoint=mgr, resume=True)
    assert _labels(resumed) == full
    assert mgr.manifest(mgr.latest_step())["metrics"]["done"] is True
    # resuming a DONE checkpoint returns the stored labels unchanged
    again = strongly_connected_components(g, checkpoint=mgr, resume=True)
    assert _labels(again) == full


def test_checkpoint_trim_only_graph_saves_done(spark, tmp_path):
    """A DAG dissolves entirely in the trim phase (exits mid-round); the
    manager must still end with a done=True snapshot."""
    from linkgraph.checkpoint import CheckpointManager

    edges = [(1, 2), (2, 3), (3, 4)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    mgr = CheckpointManager(str(tmp_path / "scc_dag"), spark)
    out = strongly_connected_components(g, checkpoint=mgr)
    assert _labels(out) == {i: i for i in range(1, 5)}
    assert mgr.manifest(mgr.latest_step())["metrics"]["done"] is True
