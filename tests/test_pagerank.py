"""PageRank parity vs networkx oracle (BASELINE.json:6 — allclose 1e-6),
dangling handling, checkpoint/resume equivalence."""

import networkx as nx
import numpy as np
import pytest

from linkgraph import CheckpointManager, LinkGraph, pagerank
from tests.fixtures import karate_edges, random_digraph


def _nx_pagerank(edges, directed=True, weighted=False, n_nodes=None):
    """networkx-semantics PageRank oracle in dense numpy (nx.pagerank needs
    scipy, absent here): normalized, dangling mass redistributed uniformly."""
    g = nx.DiGraph() if directed else nx.Graph()
    if n_nodes:
        g.add_nodes_from(range(n_nodes))
    for e in edges:
        if weighted:
            g.add_edge(e[0], e[1], weight=e[2])
        else:
            g.add_edge(e[0], e[1])
    nodes = sorted(g.nodes())
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    p = np.zeros((n, n))
    for u, v, data in g.edges(data=True):
        w = data.get("weight", 1.0)
        p[idx[u], idx[v]] += w
        if not directed:
            p[idx[v], idx[u]] += w
    out = p.sum(axis=1)
    dangling = out == 0
    with np.errstate(invalid="ignore", divide="ignore"):
        p = np.where(out[:, None] > 0, p / np.where(out[:, None] == 0, 1, out[:, None]), 0)
    alpha = 0.85
    r = np.full(n, 1.0 / n)
    for _ in range(1000):
        d_mass = r[dangling].sum()
        r_new = (1 - alpha) / n + alpha * (p.T @ r + d_mass / n)
        if np.abs(r_new - r).sum() < 1e-13:
            r = r_new
            break
        r = r_new
    return {v: r[idx[v]] for v in nodes}


def _assert_parity(result, oracle, atol=1e-6):
    got = {r["id"]: r["pagerank"] for r in result.ranks.collect()}
    assert set(got) == set(oracle)
    ours = np.array([got[k] for k in sorted(oracle)])
    ref = np.array([oracle[k] for k in sorted(oracle)])
    assert np.allclose(ours, ref, atol=atol), np.abs(ours - ref).max()
    assert abs(ours.sum() - 1.0) < 1e-9


def test_karate_parity(spark):
    edges = karate_edges()
    df = spark.createDataFrame(edges, ["src", "dst"])
    g = LinkGraph(df, keys={"directed": False})
    res = pagerank(g, tol=1e-7, strategy="distributed")
    assert res.converged
    _assert_parity(res, _nx_pagerank(edges, directed=False))


def test_directed_with_dangling(spark):
    # b and d are dangling (no out-edges)
    edges = [("a", "b"), ("a", "c"), ("c", "d"), ("e", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    res = pagerank(LinkGraph(df), tol=1e-7, strategy="distributed")
    _assert_parity(res, _nx_pagerank(edges))


def test_weighted_random_graph(spark):
    edges = random_digraph(60, 0.08, seed=7, weighted=True)
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    res = pagerank(LinkGraph(df), tol=1e-7, strategy="distributed")
    _assert_parity(res, _nx_pagerank(edges, weighted=True, n_nodes=60))


def test_all_strategies_agree(spark):
    """Arrow-kernel distributed, native distributed, and driver-local numpy
    are three physical plans for ONE logical operator: at a fixed 8
    supersteps they must agree to summation-order ulps."""
    edges = random_digraph(40, 0.1, seed=3)
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    g = LinkGraph(df)
    a = {
        r["id"]: r["pagerank"]
        for r in pagerank(g, tol=0.0, max_iter=8, use_arrow_kernel=True).ranks.collect()
    }
    b = {
        r["id"]: r["pagerank"]
        for r in pagerank(
            g, tol=0.0, max_iter=8, strategy="distributed"
        ).ranks.collect()
    }
    c = {
        r["id"]: r["pagerank"]
        for r in pagerank(g, tol=0.0, max_iter=8, strategy="local").ranks.collect()
    }
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)
    assert all(abs(b[k] - c[k]) < 1e-12 for k in b)


def test_auto_strategy_gate(spark):
    """auto routes small graphs to the local plan, but any distributed-only
    feature (checkpoint/resume/Arrow kernel) forces the superstep loop; an
    explicit local + such a feature is an error."""
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    res = pagerank(g, tol=0.0, max_iter=1, strategy="auto")
    # the local plan materializes via createDataFrame — no shuffle exchange
    assert "Exchange" not in res.ranks._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError):
        pagerank(g, strategy="local", use_arrow_kernel=True)
    with pytest.raises(ValueError):
        pagerank(g, strategy="nope")


def test_checkpoint_resume_equivalence(spark, tmp_ckpt):
    """A run interrupted mid-iteration and resumed must match an
    uninterrupted run (BASELINE.json:14 resumability)."""
    edges = random_digraph(50, 0.08, seed=11)
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    g = LinkGraph(df)

    # 12 uninterrupted supersteps vs 6 + checkpoint + resume to 12:
    # identical scores, exact — resumability without needing convergence.
    full = pagerank(g, tol=0.0, max_iter=12, use_arrow_kernel=False)
    mgr = CheckpointManager(tmp_ckpt, spark)
    pagerank(g, tol=0.0, max_iter=6, checkpoint=mgr, checkpoint_interval=3, use_arrow_kernel=False)
    assert mgr.latest_step() == 6
    man = mgr.manifest(6)
    assert "l1_delta" in man["metrics"] and "ranks" in man["tables"]
    assert man["tables"]["ranks"]["partition_rows"]  # per-partition lineage

    resumed = pagerank(g, tol=0.0, max_iter=12, checkpoint=mgr, resume=True, use_arrow_kernel=False)
    assert resumed.iterations == 12
    a = {r["id"]: r["pagerank"] for r in full.ranks.collect()}
    b = {r["id"]: r["pagerank"] for r in resumed.ranks.collect()}
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)


def test_metrics_history(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    res = pagerank(
        LinkGraph(spark.createDataFrame(edges, ["src", "dst"])),
        tol=1e-7,
        use_arrow_kernel=False,
    )
    assert res.history
    l1s = [h["l1_delta"] for h in res.history]
    assert l1s[-1] <= 1e-7
    assert all(h["active_vertices"] >= 0 for h in res.history)


def test_default_update_path_is_codegen(spark):
    """The default update path must stay JVM-side: no Arrow/Python eval node
    in the physical plan, and use_arrow_kernel defaults to False."""
    import inspect

    from linkgraph.algorithms.pagerank import update_expr

    assert inspect.signature(pagerank).parameters["use_arrow_kernel"].default is False

    df = spark.createDataFrame([("a", 0.1), ("b", None)], ["id", "_contrib"])
    native = df.select(update_expr(0.85, 2, 0.0).alias("pagerank"))
    plan = native._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    arrow = df.select(update_expr(0.85, 2, 0.0, use_arrow_kernel=True).alias("pagerank"))
    arrow_plan = arrow._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in arrow_plan  # the hook still works
    got = sorted(r["pagerank"] for r in native.collect())
    want = sorted(r["pagerank"] for r in arrow.collect())
    assert all(abs(x - y) < 1e-15 for x, y in zip(got, want))


def _np_ppr(edges, personalization, directed=True, damping=0.85, iters=2000):
    """Dense numpy personalized-PageRank oracle matching the engine's
    documented semantics: p normalized over graph nodes, r0 = p, dangling
    mass redistributed by p."""
    g = nx.DiGraph() if directed else nx.Graph()
    for e in edges:
        g.add_edge(e[0], e[1])
    nodes = sorted(g.nodes())
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    m = np.zeros((n, n))
    for u, v in g.edges():
        m[idx[u], idx[v]] += 1.0
        if not directed:
            m[idx[v], idx[u]] += 1.0
    out = m.sum(axis=1)
    dangling = out == 0
    with np.errstate(invalid="ignore", divide="ignore"):
        m = np.where(out[:, None] > 0, m / np.where(out[:, None] == 0, 1, out[:, None]), 0)
    p = np.array([personalization.get(v, 0.0) for v in nodes], dtype=float)
    p = p / p.sum()
    r = p.copy()
    for _ in range(iters):
        dm = r[dangling].sum()
        r_new = (1 - damping) * p + damping * (m.T @ r + dm * p)
        if np.abs(r_new - r).sum() < 1e-13:
            return {v: r_new[idx[v]] for v in nodes}, True
        r = r_new
    return {v: r[idx[v]] for v in nodes}, False


def test_personalized_pagerank_parity(spark):
    edges = random_digraph(40, 0.08, seed=7)
    seeds = {edges[0][0]: 2.0, edges[1][0]: 1.0, edges[2][1]: 1.0}
    oracle, _ = _np_ppr([(s, d) for s, d, _ in edges], seeds)
    df = spark.createDataFrame([(s, d) for s, d, _ in edges], ["src", "dst"])
    g = LinkGraph(df)
    res = pagerank(g, personalization=seeds, tol=1e-12, max_iter=500)
    got = {r["id"]: r["pagerank"] for r in res.ranks.collect()}
    assert set(got) == set(oracle)
    ours = np.array([got[k] for k in sorted(oracle)])
    ref = np.array([oracle[k] for k in sorted(oracle)])
    assert np.allclose(ours, ref, atol=1e-8), np.abs(ours - ref).max()
    # teleport-seeded mass: seeds hold strictly more rank than uniform share
    assert got[edges[0][0]] > 1.0 / len(oracle)


def test_personalized_strategies_agree(spark):
    edges = random_digraph(30, 0.1, seed=3)
    seeds = {edges[0][0]: 1.0}
    df = spark.createDataFrame([(s, d) for s, d, _ in edges], ["src", "dst"])
    g = LinkGraph(df)
    a = pagerank(g, personalization=seeds, tol=1e-10, max_iter=200,
                 strategy="local")
    b = pagerank(g, personalization=seeds, tol=1e-10, max_iter=200,
                 strategy="distributed")
    ga = {r["id"]: r["pagerank"] for r in a.ranks.collect()}
    gb = {r["id"]: r["pagerank"] for r in b.ranks.collect()}
    assert set(ga) == set(gb)
    assert np.allclose([ga[k] for k in sorted(ga)], [gb[k] for k in sorted(ga)],
                       atol=1e-9)


def test_personalization_validation(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError, match="non-empty"):
        pagerank(g, personalization={})
    with pytest.raises(ValueError, match=">=0"):
        pagerank(g, personalization={"a": -1.0})
    with pytest.raises(ValueError, match="no mass"):
        pagerank(g, personalization={"zzz": 1.0}, strategy="distributed")


def test_pagerank_warm_start_continuation_and_equivalence(spark):
    """Warm-starting with k-step cold ranks then running j more steps must
    equal an uninterrupted k+j-step run (both strategies), and warm-starting
    from the converged fixpoint must converge immediately."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from linkgraph import LinkGraph, pagerank

    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    e = n.select(
        F.concat(F.lit("n"), "n_nationkey").alias("src"),
        F.concat(F.lit("r"), "n_regionkey").alias("dst"),
    )
    g = LinkGraph(e, keys={"directed": False})

    for strat in ("local", "distributed"):
        cold2 = pagerank(g, tol=0.0, max_iter=2, strategy=strat)
        warm = pagerank(
            g, tol=0.0, max_iter=3, strategy=strat, initial_ranks=cold2.ranks
        )
        cold5 = pagerank(g, tol=0.0, max_iter=5, strategy=strat)
        a = {r["id"]: r["pagerank"] for r in warm.ranks.collect()}
        b = {r["id"]: r["pagerank"] for r in cold5.ranks.collect()}
        assert set(a) == set(b)
        for k in a:
            assert abs(a[k] - b[k]) < 1e-12, (strat, k)

    conv = pagerank(g, tol=1e-12, max_iter=300)
    rewarm = pagerank(g, tol=1e-10, max_iter=50, initial_ranks=conv.ranks)
    assert rewarm.converged and rewarm.iterations <= 2

    # guards: zero-mass warm start; resume conflict
    zero = conv.ranks.select("id", F.lit(0.0).alias("pagerank"))
    with _pt.raises(ValueError):
        pagerank(g, max_iter=2, initial_ranks=zero, strategy="local")
    with _pt.raises(ValueError):
        pagerank(g, max_iter=2, initial_ranks=conv.ranks, resume=True)
