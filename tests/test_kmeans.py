"""Deterministic Lloyd k-means — python replay, ties, empty clusters."""

import random

import pytest

from linkgraph.pipeline.similarity import kmeans_clusters


def _replay(rows, k, n_iter):
    """Exact python mirror of the documented semantics."""
    pts = {i: [float(x) for x in v] for i, v in rows}
    d = len(next(iter(pts.values())))
    centroids = [pts[i][:] for i in sorted(pts)[:k]]

    def assign():
        out = {}
        for i, v in pts.items():
            dists = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in centroids]
            out[i] = dists.index(min(dists))  # first min → lowest index
        return out

    for _ in range(n_iter):
        a = assign()
        sums = {}
        for i, c in a.items():
            s, n = sums.setdefault(c, ([0.0] * d, 0))
            sums[c] = ([x + y for x, y in zip(s, pts[i])], n + 1)
        centroids = [
            [x / sums[j][1] for x in sums[j][0]] if j in sums else centroids[j]
            for j in range(k)
        ]
    return assign()


def _run(spark, rows, k, n_iter):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kmeans_clusters(df, k, n_iter=n_iter)
    return {r["vec_id"]: r["cluster"] for r in got.collect()}


def test_matches_python_replay(spark):
    random.seed(5)
    rows = [(i, [random.uniform(-2, 2) for _ in range(4)]) for i in range(40)]
    # float32 storage: replay from the same float32-rounded values
    import numpy as np

    rows32 = [(i, [float(np.float32(x)) for x in v]) for i, v in rows]
    for n_iter in (0, 1, 3):
        assert _run(spark, rows, 3, n_iter) == _replay(rows32, 3, n_iter)


def test_separated_blobs_recover_partition(spark):
    random.seed(9)
    rows, want = [], {}
    # ids interleave across blobs so the smallest-id init (ids 0,1,2) seeds
    # one centroid per blob — deterministic init is naive by design
    for b, center in enumerate([(0.0, 0.0), (10.0, 10.0), (-10.0, 10.0)]):
        for j in range(15):
            i = j * 3 + b
            rows.append((i, [c + random.uniform(-0.5, 0.5) for c in center]))
            want[i] = b
    got = _run(spark, rows, 3, 2)
    # same-blob points share a cluster and blobs are separated
    by_blob = {b: {got[i] for i in want if want[i] == b} for b in range(3)}
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({s.pop() for s in by_blob.values()}) == 3


def test_tie_breaks_to_lowest_index(spark):
    # point 2 exactly between centroids 0 and 1 (init = ids 0,1) → cluster 0
    rows = [(0, [0.0]), (1, [2.0]), (2, [1.0])]
    assert _run(spark, rows, 2, 0)[2] == 0


def test_empty_cluster_keeps_centroid(spark):
    # init takes ids 0,1 (both near zero) → after one update cluster 1 can
    # go empty; the replay (which implements keep-previous) must still agree
    rows = [(0, [0.0]), (1, [0.1]), (2, [0.05]), (3, [100.0])]
    import numpy as np

    rows32 = [(i, [float(np.float32(x)) for x in v]) for i, v in rows]
    assert _run(spark, rows, 2, 2) == _replay(rows32, 2, 2)


def test_validation(spark):
    df_rows = [(0, [1.0]), (1, [2.0])]
    with pytest.raises(ValueError):
        _run(spark, df_rows, 0, 1)
    with pytest.raises(ValueError):
        _run(spark, df_rows, 3, 1)
    with pytest.raises(ValueError):
        _run(spark, df_rows, 2, -1)
