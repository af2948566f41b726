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
