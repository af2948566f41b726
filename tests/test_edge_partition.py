"""DBH vertex-cut edge partitioning — python md5 replay + cut properties."""

import hashlib

import pytest

from linkgraph import LinkGraph, dbh_edge_partition, partition_stats


def _h(v, p, salt=42):
    return int(hashlib.md5(f"{v}|{salt}".encode()).hexdigest()[:12], 16) % p


def _replay(edges, p, salt=42):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for a, b in und:
        pick = b if deg[b] < deg[a] else a  # ties → a
        out[(a, b)] = _h(pick, p, salt)
    return out


def _run(spark, edges, p, salt=42):
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    return {
        (r["a"], r["b"]): r["part"]
        for r in dbh_edge_partition(g, p, salt=salt).collect()
    }


def test_matches_python_replay(spark):
    import random

    random.seed(17)
    nodes = [f"v{i}" for i in range(30)]
    edges = sorted(
        {(a, b) for a in nodes for b in nodes if a != b and random.random() < 0.15}
    )
    for p in (2, 7):
        assert _run(spark, edges, p) == _replay(edges, p)


def test_hub_edges_spread_leaves_stay_whole(spark):
    # star: every edge hashes its leaf (degree 1 < hub degree) → the hub is
    # the cut vertex; each leaf appears in exactly one partition
    edges = [("hub", f"l{i}") for i in range(40)]
    parts = _run(spark, edges, 8)
    assert len(set(parts.values())) > 1  # hub actually cut across parts
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    row = partition_stats(dbh_edge_partition(g, 8)).collect()[0]
    used = len(set(parts.values()))
    # replication: hub in `used` parts, 40 leaves in 1 each, 41 vertices
    assert row["n_vertices"] == 41
    assert row["replication_factor"] == pytest.approx((used + 40) / 41)
    assert row["n_edges"] == 40
    assert row["n_parts_used"] == used


def test_duplicates_direction_loops_canonicalized(spark):
    edges = [("a", "b"), ("b", "a"), ("a", "b"), ("c", "c"), ("b", "c")]
    parts = _run(spark, edges, 4)
    assert set(parts) == {("a", "b"), ("b", "c")}


def test_stats_perfect_balance(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b"), ("c", "d")], ["src", "dst"]))
    # with n_parts=1 everything lands in part 0: balance 1.0, replication 1.0
    row = partition_stats(dbh_edge_partition(g, 1)).collect()[0]
    assert row["balance"] == pytest.approx(1.0)
    assert row["replication_factor"] == pytest.approx(1.0)


def test_validation(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError):
        dbh_edge_partition(g, 0)


def _replay_hybrid(edges, p, threshold, salt=42):
    dedges = {e for e in edges if e[0] != e[1]}
    ind = {}
    for _, d in dedges:
        ind[d] = ind.get(d, 0) + 1
    return {
        (s, d): _h(d if ind[d] <= threshold else s, p, salt)
        for s, d in dedges
    }


def _run_hybrid(spark, edges, p, threshold):
    from linkgraph import hybrid_edge_partition

    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    return {
        (r["src"], r["dst"]): r["part"]
        for r in hybrid_edge_partition(g, p, threshold=threshold).collect()
    }


def test_hybrid_matches_python_replay(spark):
    import random

    random.seed(23)
    nodes = [f"v{i}" for i in range(25)]
    edges = sorted(
        {(a, b) for a in nodes for b in nodes if a != b and random.random() < 0.12}
    )
    for thr in (0, 2, 100):
        assert _run_hybrid(spark, edges, 5, thr) == _replay_hybrid(edges, 5, thr)


def test_hybrid_low_cut_colocates_high_cut_spreads(spark):
    # 40 sources → one hub target
    edges = [(f"s{i}", "hub") for i in range(40)]
    # threshold above 40: in-edges co-located at H(hub) → ONE partition
    low = _run_hybrid(spark, edges, 8, 100)
    assert len(set(low.values())) == 1
    # threshold below 40: hub is "high" → spread by source
    high = _run_hybrid(spark, edges, 8, 10)
    assert len(set(high.values())) > 1
