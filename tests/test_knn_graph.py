"""knn_graph: exact python replay of the brute path (same fold order, so
bit-identical doubles), LSH recall + cosine-exactness, mutual filter,
zero-vector handling."""

import numpy as np
import pytest

from linkgraph.pipeline.similarity import knn_graph


def _unit(vec):
    # replicate the engine's op order exactly: nrm = sqrt(left-fold sum of
    # squares); u_i = x_i / nrm (each op one IEEE double rounding)
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    nrm = acc**0.5
    return [float(x) / nrm for x in vec]


def _cos(ua, ub):
    acc = 0.0
    for x, y in zip(ua, ub):
        acc = acc + x * y
    return acc


def _brute_knn(rows, k):
    units = {i: _unit(v) for i, v in rows if any(x != 0.0 for x in v)}
    edges = set()
    for s in units:
        scored = sorted(
            ((-_cos(units[s], units[d]), d) for d in units if d != s),
        )[:k]
        edges |= {(s, d, -negc) for negc, d in scored}
    return edges


@pytest.fixture(scope="module")
def emb_rows():
    rng = np.random.RandomState(7)
    # three tight clusters of 12 + background noise
    centers = rng.randn(3, 16) * 3
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(12):
            rows.append((vid, [float(x) for x in centers[c] + rng.randn(16) * 0.1]))
            vid += 1
    for _ in range(14):
        rows.append((vid, [float(x) for x in rng.randn(16)]))
        vid += 1
    return rows


def test_knn_brute_exact_replay(spark, emb_rows):
    df = spark.createDataFrame(emb_rows, ["vec_id", "embedding"])
    out = knn_graph(df, k=3)
    got = {(r["src"], r["dst"], r["cosine"]) for r in out.collect()}
    assert got == _brute_knn(emb_rows, 3)
    # every src emits exactly k edges (n-1 >= k here)
    from collections import Counter

    per_src = Counter(s for s, _, _ in got)
    assert set(per_src.values()) == {3}


def test_knn_mutual_is_symmetric_subset(spark, emb_rows):
    df = spark.createDataFrame(emb_rows, ["vec_id", "embedding"])
    full = {(r["src"], r["dst"]) for r in knn_graph(df, k=3).collect()}
    mut = {(r["src"], r["dst"]) for r in knn_graph(df, k=3, mutual=True).collect()}
    assert mut <= full
    assert {(d, s) for s, d in mut} == mut  # symmetric
    assert mut  # clusters guarantee reciprocated neighbors


def test_knn_lsh_recall_and_exact_cosines(spark, emb_rows):
    df = spark.createDataFrame(emb_rows, ["vec_id", "embedding"])
    brute = {(r["src"], r["dst"]): r["cosine"] for r in knn_graph(df, k=3).collect()}
    lsh = {
        (r["src"], r["dst"]): r["cosine"]
        for r in knn_graph(
            df, k=3, method="lsh", n_planes=24, band_planes=4
        ).collect()
    }
    # cosines are exact (reranked), so any edge also in brute agrees exactly
    for pair, cos in lsh.items():
        if pair in brute:
            assert cos == brute[pair]
    # tight clusters + 6 bands: recall on within-cluster edges is high
    cluster_edges = {p for p in brute if p[0] // 12 == p[1] // 12 and p[0] < 36}
    found = sum(1 for p in cluster_edges if p in lsh)
    assert found >= 0.8 * len(cluster_edges)


def test_knn_lsh_bucket_cap_keeps_pipeline_alive(spark):
    # 60 identical vectors -> one flooding bucket; cap at 8 still yields
    # edges without the quadratic join
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = knn_graph(df, k=2, method="lsh", n_planes=8, band_planes=4, max_bucket=8)
    assert out.count() > 0
    assert all(abs(r["cosine"] - 1.0) < 1e-12 for r in out.collect())


def test_knn_drops_zero_vectors_and_validates(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [2.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {(r["src"], r["dst"]) for r in knn_graph(df, k=5).collect()}
    assert got == {(1, 3), (3, 1)}  # zero vector excluded both sides
    with pytest.raises(ValueError):
        knn_graph(df, k=0)
    with pytest.raises(ValueError):
        knn_graph(df, method="ivf")
