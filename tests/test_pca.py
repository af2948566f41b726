"""PCA pipeline: covariance parity vs numpy, projection parity vs a
driver-side eigh reference, invariants (orthonormal axes, descending
captured variance), guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline.pca import (
    _fix_signs,
    embedding_covariance,
    pca_components,
    pca_project,
)


def _emb_df(spark, arr):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(arr)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _rand(n, d, seed):
    rng = np.random.default_rng(seed)
    # float32 round-trip: the column is array<float>, numpy must see the
    # same values Spark stores
    return rng.normal(size=(n, d)).astype(np.float32).astype(np.float64)


def test_covariance_matches_numpy(spark):
    arr = _rand(200, 6, seed=1)
    got = embedding_covariance(_emb_df(spark, arr)).collect()
    want = np.cov(arr, rowvar=False, bias=True)  # population
    assert len(got) == 6 * 7 // 2
    for r in got:
        assert r["cov"] == pytest.approx(want[r["i"], r["j"]], abs=1e-10)


def test_components_match_driver_eigh(spark):
    arr = _rand(300, 5, seed=2)
    comps, eigs, mean = pca_components(_emb_df(spark, arr), k=3)
    cov = np.cov(arr, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    np.testing.assert_allclose(mean, arr.mean(0), atol=1e-10)
    np.testing.assert_allclose(eigs, w[order], atol=1e-10)
    np.testing.assert_allclose(comps, _fix_signs(v[:, order]), atol=1e-8)
    # orthonormal axes
    np.testing.assert_allclose(comps.T @ comps, np.eye(3), atol=1e-10)


def test_projection_parity_and_variance(spark):
    arr = _rand(250, 8, seed=3)
    df = _emb_df(spark, arr)
    out = pca_project(df, k=4).orderBy("vec_id").collect()
    comps, eigs, mean = pca_components(df, k=4)
    want = (arr - mean) @ comps
    got = np.array([r["pca"] for r in out])
    assert [r["vec_id"] for r in out] == list(range(250))
    np.testing.assert_allclose(got, want, atol=1e-8)
    # captured variance along axis c equals eigenvalue c, descending
    var = got.var(axis=0)
    np.testing.assert_allclose(var, eigs, atol=1e-8)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(3))


def test_projection_on_testdata_embeddings(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = pca_project(df, k=4)
    assert out.count() == df.count()
    row = out.limit(1).collect()[0]
    assert len(row["pca"]) == 4


def test_sign_fix_deterministic():
    v = np.array([[0.6, -0.8], [-0.8, -0.6]])
    f = _fix_signs(v)
    # column 0: max-|.| component is index 1 (−0.8) → flipped
    np.testing.assert_allclose(f[:, 0], [-0.6, 0.8])
    # column 1: max-|.| component is index 0 (−0.8) → flipped
    np.testing.assert_allclose(f[:, 1], [0.8, 0.6])


def test_guards(spark):
    arr = _rand(10, 3, seed=4)
    with pytest.raises(ValueError):
        pca_components(_emb_df(spark, arr), k=0)
    with pytest.raises(ValueError):
        pca_components(_emb_df(spark, arr), k=4)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        embedding_covariance(empty)


def test_eigvals_2d_closed_form(spark):
    """eigh on a 2x2 covariance equals the closed form
    (a+c)/2 ± sqrt(((a-c)/2)² + b²) — the identity the
    `pca_eigvals_2d` DuckDB oracle replays."""
    arr = _rand(400, 2, seed=11)
    _, eigs, _ = pca_components(_emb_df(spark, arr), k=2)
    cov = np.cov(arr, rowvar=False, bias=True)
    a, b, c = cov[0, 0], cov[0, 1], cov[1, 1]
    disc = np.sqrt(((a - c) / 2) ** 2 + b**2)
    np.testing.assert_allclose(eigs, [(a + c) / 2 + disc, (a + c) / 2 - disc],
                               atol=1e-12)


def test_whitening_unit_variance(spark):
    arr = _rand(300, 6, seed=7)
    out = pca_project(_emb_df(spark, arr), k=3, whiten=True).collect()
    got = np.array([r["pca"] for r in out])
    np.testing.assert_allclose(got.var(axis=0), np.ones(3), atol=1e-8)
    # whitened components are decorrelated too
    c = np.cov(got, rowvar=False, bias=True)
    np.testing.assert_allclose(c, np.eye(3), atol=1e-8)
