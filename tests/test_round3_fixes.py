"""Round-3 hardening: hub-safe plans (no unbounded-key windows), caller-cache
preservation in the strategy gates, empty-node-table local CC, moebius payload
robustness, and walk-cache delete safety."""

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------- hub-safe plans (no Window)


def test_walker_norm_plan_window_free(spark):
    """Weight normalization must be groupBy+join, never partitionBy(src)
    window — a hub src's edge list would concentrate in one sort task."""
    from linkgraph.algorithms.random_walker import _normalized_edges

    edges = spark.createDataFrame(
        [("h", f"d{i}", float(i + 1)) for i in range(50)], ["src", "dst", "weight"]
    )
    g = LinkGraph(edges)
    norm = _normalized_edges(g)
    assert "Window" not in _plan(norm)
    # semantics: per-src probabilities sum to 1
    total = norm.agg(F.sum("norm_sum")).collect()[0][0]
    assert total == pytest.approx(1.0)


def test_minhash_cap_plan_window_free_and_bounded(spark):
    """The max_bucket cap must not sort the pathological bucket it caps:
    plan is window-free, and an oversized (boilerplate) bucket is cut to
    ~max_bucket deterministic survivors."""
    from linkgraph.pipeline.dedup import minhash_verified_pairs

    # 300 identical docs -> every band collapses to ONE bucket of 300
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text appears everywhere") for i in range(300)],
        ["doc_id", "text"],
    )
    pairs = minhash_verified_pairs(
        docs, num_hashes=8, bands=2, shingle_k=4, max_bucket=40
    )
    assert "Window" not in _plan(pairs)
    n = pairs.count()
    # per band ~Binomial(300, 40/300) survivors -> C(s,2) pairs; far below
    # the uncapped C(300,2)=44850, far above zero
    assert 50 < n < 15_000
    # deterministic: identical rerun, identical survivor set
    assert pairs.count() == n


def test_minhash_small_buckets_uncapped(spark):
    """Buckets at or under max_bucket pass through untouched — the cap only
    fires on oversized buckets."""
    from linkgraph.pipeline.dedup import minhash_verified_pairs

    docs = spark.createDataFrame(
        [(i, "identical text for a tiny duplicate cluster") for i in range(5)],
        ["doc_id", "text"],
    )
    pairs = minhash_verified_pairs(docs, num_hashes=8, bands=2, shingle_k=4)
    assert pairs.count() == 10  # C(5,2), all verified at jaccard 1.0


# ------------------------------------------- strategy gates & caller caches


def test_pagerank_auto_preserves_caller_cache(spark):
    from linkgraph.algorithms.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    g = LinkGraph(edges)
    g.edges.persist()
    try:
        g.edges.count()
        res = pagerank(g, strategy="auto", tol=1e-8)
        assert res.converged
        # the gate must NOT evict the caller's cache as a side effect
        assert g.edges.is_cached
        # and must clean up its own persist of the node table
        assert not g.nodes.is_cached
    finally:
        g.edges.unpersist()


def test_cc_auto_preserves_caller_cache(spark):
    from linkgraph.algorithms.components import connected_components

    edges = spark.createDataFrame([("a", "b"), ("c", "d")], ["src", "dst"])
    g = LinkGraph(edges)
    g.edges.persist()
    try:
        g.edges.count()
        cc = connected_components(g, strategy="auto")
        assert cc.select("component").distinct().count() == 2
        assert g.edges.is_cached
        assert not g.nodes.is_cached
    finally:
        g.edges.unpersist()


def test_gate_fallthrough_releases_cache(spark):
    """When auto falls through to the distributed loop, the gate's raw-table
    persist must be released (the loop's own persisted tables take over) —
    no cached copy may outlive the call."""
    from linkgraph.algorithms.components import connected_components
    from linkgraph.algorithms.pagerank import pagerank

    edges = spark.createDataFrame(
        [(f"a{i}", f"b{i % 3}") for i in range(20)], ["src", "dst"]
    )
    g = LinkGraph(edges)
    # This dangling-heavy 23-node graph converges geometrically at ~0.85/step,
    # so tol=1e-6 needs ~85 damped power iterations — budget 150.
    res = pagerank(g, strategy="auto", local_max_edges=1, tol=1e-6, max_iter=150)
    assert res.converged
    assert not g.edges.is_cached and not g.nodes.is_cached
    cc = connected_components(g, strategy="auto", local_max_edges=1)
    assert cc.count() > 0
    assert not g.edges.is_cached and not g.nodes.is_cached


def test_cc_local_empty_node_table_with_edges(spark):
    """Explicitly-empty node table + non-empty edges: the local plan must
    return the same typed empty result as the distributed plan (pandas can't
    infer a schema from zero object rows)."""
    from linkgraph.algorithms.components import connected_components

    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    nodes = spark.createDataFrame([], "id string")
    g = LinkGraph(edges, nodes=nodes)
    local = connected_components(g, strategy="local", with_sizes=False)
    dist = connected_components(g, strategy="distributed", with_sizes=False)
    assert local.count() == 0 == dist.count()
    assert local.schema == dist.schema


# -------------------------------------------------------- moebius robustness


def test_moebius_missing_endpoint_no_keyerror(spark):
    """An edge endpoint absent from an explicit node table must not KeyError:
    the undrawable link is dropped, the present nodes keep full-graph degree
    counts."""
    import json

    from linkgraph.viz import moebius_json

    edges = spark.createDataFrame(
        [("c", "a"), ("c", "ghost"), ("a", "b")], ["src", "dst"]
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["id"])  # no ghost
    g = LinkGraph(edges, nodes=nodes)
    payload = json.loads(moebius_json(g, "c", depth=2))
    ids = {n["id"] for n in payload["nodes"]}
    assert "ghost" not in ids and {"a", "b", "c"} <= ids
    for link in payload["links"]:
        assert link["source"] in ids and link["target"] in ids
    counts = {n["id"]: n["count"] for n in payload["nodes"]}
    assert counts["c"] == 2  # c→a, c→ghost both count toward full-graph degree


# ------------------------------------------------------ walk-cache safety


def test_clear_dir_refuses_foreign_directory(spark, tmp_path):
    """path_cache pointed at a directory holding non-walk-cache data must be
    refused, not recursively deleted."""
    from linkgraph.algorithms.node2vec import Node2Vec

    d = tmp_path / "userdata"
    d.mkdir()
    (d / "precious.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to clear"):
        Node2Vec._clear_dir(spark, str(d))
    assert (d / "precious.txt").exists()


def test_clear_dir_clears_own_blocks(spark, tmp_path):
    from linkgraph.algorithms.node2vec import Node2Vec

    d = tmp_path / "cache"
    (d / "block=0").mkdir(parents=True)
    (d / "block=0" / "part-0.parquet").write_text("x")
    (d / "_SUCCESS").write_text("")
    Node2Vec._clear_dir(spark, str(d))
    assert not (d / "block=0").exists() and not (d / "_SUCCESS").exists()
    # missing directory is a no-op
    Node2Vec._clear_dir(spark, str(tmp_path / "nope"))
