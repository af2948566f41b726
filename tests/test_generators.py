"""R-MAT / G(n, m) generators — determinism, partitioning-invariance,
skew shape, guards."""

import pytest
from pyspark.sql import functions as F

from linkgraph import gnm_graph, rmat_graph


def test_rmat_deterministic_and_partition_invariant(spark):
    a = rmat_graph(spark, scale=6, num_edges=500, seed=3, num_partitions=2)
    b = rmat_graph(spark, scale=6, num_edges=500, seed=3, num_partitions=13)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b and len(rows_a) == 500
    # node ids within [0, 2^6)
    mx = a.agg(F.max("src"), F.max("dst"), F.min("src"), F.min("dst")).collect()[0]
    assert 0 <= mx[2] and 0 <= mx[3] and mx[0] < 64 and mx[1] < 64
    # different seed → different edges
    c = rmat_graph(spark, scale=6, num_edges=500, seed=4)
    assert sorted(map(tuple, c.collect())) != rows_a


def test_rmat_skew_beats_uniform(spark):
    # Graph500 params concentrate mass in the (0,0) quadrant: the max
    # out-degree must clearly exceed the uniform generator's on the same
    # node/edge budget
    r = rmat_graph(spark, scale=7, num_edges=2000, seed=5)
    u = gnm_graph(spark, n=128, num_edges=2000, seed=5)
    mr = r.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    mu = u.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert mr > mu * 2


def test_generator_guards(spark):
    with pytest.raises(ValueError):
        rmat_graph(spark, scale=0, num_edges=10)
    with pytest.raises(ValueError):
        rmat_graph(spark, scale=4, num_edges=10, a=0.6, b=0.3, c=0.2)
    with pytest.raises(ValueError):
        gnm_graph(spark, n=0, num_edges=10)


def test_generators_feed_linkgraph(spark):
    from linkgraph import LinkGraph, pagerank

    e = rmat_graph(spark, scale=5, num_edges=300, seed=9)
    g = LinkGraph(e.select(F.col("src").cast("string"), F.col("dst").cast("string")))
    res = pagerank(g, tol=1e-8, max_iter=200)
    total = res.ranks.agg(F.sum("pagerank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_ws_deterministic_partition_invariant(spark):
    from linkgraph import watts_strogatz_graph

    a = watts_strogatz_graph(spark, n=60, k=4, p=0.3, seed=9, num_partitions=2)
    b = watts_strogatz_graph(spark, n=60, k=4, p=0.3, seed=9, num_partitions=11)
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 60 * 2
    assert sorted(map(tuple, watts_strogatz_graph(spark, 60, 4, 0.3, seed=10).collect())) != ra


def test_ws_p_zero_is_ring_lattice(spark):
    from linkgraph import watts_strogatz_graph

    e = watts_strogatz_graph(spark, n=10, k=4, p=0.0, seed=1)
    got = sorted((r["src"], r["dst"]) for r in e.collect())
    want = sorted((u, (u + j) % 10) for u in range(10) for j in (1, 2))
    assert got == want


def test_ws_p_one_rewires_most_edges(spark):
    from linkgraph import watts_strogatz_graph
    from pyspark.sql import functions as F

    e = watts_strogatz_graph(spark, n=200, k=4, p=1.0, seed=2)
    # every edge rewires except hash-collides-with-source fallbacks; no loop
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    lattice = e.filter(
        F.pmod(F.col("dst") - F.col("src") + F.lit(200), F.lit(200)).isin(1, 2)
    ).count()
    assert lattice < 0.10 * 400  # ~2/200 chance per edge of landing on lattice


def test_ws_small_world_clustering(spark):
    # at small p the graph keeps high clustering vs the p=1 random rewire
    import networkx as nx

    from linkgraph import watts_strogatz_graph

    def cc(p):
        rows = watts_strogatz_graph(spark, n=100, k=6, p=p, seed=4).collect()
        g = nx.Graph()
        g.add_nodes_from(range(100))
        g.add_edges_from((r["src"], r["dst"]) for r in rows)
        return nx.average_clustering(g)

    assert cc(0.05) > 2 * cc(1.0)


def test_ws_guards(spark):
    from linkgraph import watts_strogatz_graph

    for bad in (dict(n=10, k=3, p=0.1), dict(n=10, k=0, p=0.1),
                dict(n=4, k=4, p=0.1), dict(n=10, k=4, p=1.5)):
        with pytest.raises(ValueError):
            watts_strogatz_graph(spark, **bad)


def test_zipf_deterministic_partition_invariant(spark):
    from linkgraph import zipf_graph

    a = zipf_graph(spark, n=200, m=800, s=1.0, seed=5, num_partitions=2)
    b = zipf_graph(spark, n=200, m=800, s=1.0, seed=5, num_partitions=9)
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 800
    assert sorted(map(tuple, zipf_graph(spark, 200, 800, 1.0, seed=6).collect())) != ra
    mx = a.agg(F.max("src"), F.max("dst"), F.min("src"), F.min("dst")).collect()[0]
    assert mx[2] >= 0 and mx[3] >= 0 and mx[0] < 200 and mx[1] < 200


def test_zipf_skew_and_uniform_control(spark):
    from linkgraph import zipf_graph

    z = zipf_graph(spark, n=500, m=5000, s=1.0, seed=7)
    u = zipf_graph(spark, n=500, m=5000, s=0.0, seed=7)
    mz = z.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    mu = u.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    # s=1 rank-0 mass ≈ 1/ln(501) ≈ 16% of draws; uniform max ≈ 10/500
    assert mz > mu * 5
    # low ranks dominate: rank-0 out-degree is the max
    top = z.groupBy("src").count().orderBy(F.desc("count")).first()
    assert top["src"] == 0


def test_zipf_python_replay_exact(spark):
    """Replay the inverse CDF in pure python: the engine's column
    expression must reproduce hashlib+math digit-for-digit."""
    import hashlib
    import math

    from linkgraph import zipf_graph

    n, m, s, seed = 150, 120, 1.4, 21

    def h60(i, tag):
        return int(hashlib.md5(f"{seed}:{i}:{tag}".encode()).hexdigest()[:15], 16)

    def node(i, tag):
        u = (h60(i, tag) + 0.5) / float(1 << 60)
        top = float((n + 1.0) ** (1.0 - s))
        x = (u * (top - 1.0) + 1.0) ** (1.0 / (1.0 - s))
        return min(math.floor(x) - 1, n - 1)

    want = sorted((i, node(i, "s"), node(i, "d")) for i in range(m))
    got = sorted(map(tuple, zipf_graph(spark, n, m, s, seed=seed).collect()))
    assert got == want


def test_zipf_guards(spark):
    from linkgraph import zipf_graph

    for bad in (dict(n=0, m=5), dict(n=5, m=-1), dict(n=5, m=5, s=-0.5)):
        with pytest.raises(ValueError):
            zipf_graph(spark, **bad)


def test_powerlaw_alpha_python_replay(spark):
    """MLE replay: collect the degree table and recompute CSN eq. 3.7 in
    python — alpha/sigma/n must agree to float equality."""
    import math

    from linkgraph import LinkGraph, powerlaw_alpha, zipf_graph

    e = zipf_graph(spark, n=120, m=900, s=1.0, seed=3)
    g = LinkGraph(e.select("src", "dst"))
    alpha, sigma, n_tail = powerlaw_alpha(g, xmin=2)
    from collections import Counter

    deg = Counter()
    for r in e.collect():
        deg[r["src"]] += 1
        deg[r["dst"]] += 1
    tail = [d for d in deg.values() if d >= 2]
    slog = sum(math.log(d / 1.5) for d in tail)
    want = 1.0 + len(tail) / slog
    assert n_tail == len(tail)
    assert abs(alpha - want) < 1e-9
    assert abs(sigma - (alpha - 1.0) / math.sqrt(len(tail))) < 1e-12


def test_powerlaw_alpha_recovers_exponent(spark):
    """Closing the loop: zipf(s=1) has degree CCDF exponent ≈ 2; the MLE
    over a decent sample must land near it."""
    from linkgraph import LinkGraph, powerlaw_alpha, zipf_graph

    e = zipf_graph(spark, n=3000, m=30000, s=1.0, seed=11)
    g = LinkGraph(e.select("src", "dst"))
    alpha, sigma, n_tail = powerlaw_alpha(g, xmin=5)
    assert n_tail > 100
    assert 1.6 < alpha < 2.4


def test_powerlaw_alpha_guards_and_empty_tail(spark):
    import math

    from linkgraph import LinkGraph, powerlaw_alpha

    g = LinkGraph(
        spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    )
    with pytest.raises(ValueError):
        powerlaw_alpha(g, xmin=0)
    with pytest.raises(ValueError):
        powerlaw_alpha(g, degree="sideways")
    alpha, sigma, n = powerlaw_alpha(g, xmin=99)
    assert n == 0 and math.isnan(alpha) and math.isnan(sigma)
    # in/out split: node b has in=1 out=1, total=2
    a_in = powerlaw_alpha(g, xmin=1, degree="in")
    assert a_in[2] == 2  # b and c have in-edges
