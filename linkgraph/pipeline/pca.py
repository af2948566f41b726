"""PCA over an embedding column — distributed covariance, driver-side
eigendecomposition of the d×d matrix, distributed projection.

Beyond the reference (no dimensionality reduction under ``mercury/``); a
training-data pipeline at 100 TB wants PCA for embedding compression,
whitening before clustering, and drift dashboards.

Scale shape: the data-sized work is ONE pass — an Arrow ``mapInPandas``
kernel folds each input batch into its d(d+1)/2 upper-triangular Gram
partial (numpy ``X.T @ X``), so the shuffle moving to the final aggregate
carries only ``partitions × d²`` metadata rows, never the vectors. Means
come from a native posexplode aggregate (pure JVM). The eigendecomposition
runs on the driver over the d×d covariance — d is the embedding width
(64–4096), so this is microseconds and does NOT grow with row count. The
projection is a map-only Arrow matmul against the broadcast component
matrix: no shuffle, partition-preserving.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_long(df: DataFrame, vec_col: str, d: int) -> DataFrame:
    """Per-batch upper-triangular Gram partials in long form
    [i, j, sxy, n] — numpy fold per Arrow batch, output is metadata-sized
    (d(d+1)/2 rows per batch)."""
    iu0, iu1 = np.triu_indices(d)

    def fn(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            arr = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if arr.ndim != 2 or arr.shape[1] != d:
                raise ValueError(
                    f"expected fixed-width {d}-dim vectors, got {arr.shape}"
                )
            gram = arr.T @ arr
            yield pd.DataFrame(
                {
                    "i": iu0.astype(np.int32),
                    "j": iu1.astype(np.int32),
                    "sxy": gram[iu0, iu1],
                    "n": np.full(len(iu0), arr.shape[0], dtype=np.int64),
                }
            )

    return df.select(vec_col).mapInPandas(fn, "i int, j int, sxy double, n long")


def _dim_of(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not row:
        raise ValueError("empty input — cannot infer embedding dimension")
    return int(row[0]["d"])


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Population covariance matrix of the embedding column, long-form
    DataFrame [i, j, cov] over the upper triangle (i ≤ j):
    cov(i,j) = Σxᵢxⱼ/N − mᵢ·mⱼ.

    The Gram pass is the Arrow fold described in the module docstring; the
    means are a native posexplode avg (JVM, no Python). Output is
    d(d+1)/2 rows — metadata-sized at any input scale."""
    d = dim or _dim_of(df, vec_col)
    gram = (
        _gram_long(df, vec_col, d)
        .groupBy("i", "j")
        .agg(F.sum("sxy").alias("_sxy"), F.sum("n").alias("_n"))
    )
    means = (
        df.select(F.posexplode(vec_col).alias("_k", "_v"))
        .groupBy("_k")
        .agg(F.avg(F.col("_v").cast("double")).alias("_m"))
    )
    return (
        gram.join(means.select(F.col("_k").alias("i"), F.col("_m").alias("_mi")), "i")
        .join(means.select(F.col("_k").alias("j"), F.col("_m").alias("_mj")), "j")
        .select(
            "i",
            "j",
            (F.col("_sxy") / F.col("_n") - F.col("_mi") * F.col("_mj")).alias("cov"),
        )
    )


def _fix_signs(vecs: np.ndarray) -> np.ndarray:
    """Deterministic eigenvector orientation: flip each column so its
    largest-|·| component (first such index on ties) is positive."""
    out = vecs.copy()
    for c in range(out.shape[1]):
        k = int(np.argmax(np.abs(out[:, c])))
        if out[k, c] < 0:
            out[:, c] = -out[:, c]
    return out


def pca_components(
    df: DataFrame, k: int, vec_col: str = "embedding", dim: int | None = None
):
    """Top-k principal axes of the embedding column. Returns
    (components: ndarray[d, k], eigenvalues: ndarray[k], mean: ndarray[d]) —
    eigenvalues descending, eigenvector signs fixed per :func:`_fix_signs`.

    Driver-side work is the eigh of the d×d covariance (d = embedding
    width, independent of row count); everything data-sized is the one
    distributed covariance pass."""
    d = dim or _dim_of(df, vec_col)
    if not (1 <= k <= d):
        raise ValueError(f"need 1 <= k <= {d}, got k={k}")
    # one action: the d(d+1)/2 covariance rows carry the per-dim means
    # along (joined in already), so no second aggregate pass is needed
    rows = (
        embedding_covariance(df, vec_col, dim=d)
        .join(
            df.select(F.posexplode(vec_col).alias("_k", "_v"))
            .groupBy("_k")
            .agg(F.avg(F.col("_v").cast("double")).alias("_m"))
            .select(F.col("_k").alias("i"), F.col("_m").alias("_mi")),
            "i",
        )
        .collect()
    )
    cov = np.zeros((d, d))
    mean = np.zeros(d)
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
        mean[r["i"]] = r["_mi"]
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return _fix_signs(v[:, order]), w[order], mean


def pca_project(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center: bool = True,
    whiten: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Project every row onto the top-k principal axes — DataFrame
    [id_col, pca: array<double>]. Two passes total: the covariance fold,
    then a map-only Arrow matmul against the broadcast (d×k) component
    matrix — no shuffle in the projection stage. ``whiten=True`` scales
    each axis by 1/√eigenvalue so the output has unit variance per
    component (axes with eigenvalue ≤ 1e-12 are left unscaled rather than
    exploded)."""
    comps, eigs, mean = pca_components(df, k, vec_col, dim=dim)
    if whiten:
        scale = np.where(eigs > 1e-12, 1.0 / np.sqrt(np.maximum(eigs, 1e-300)), 1.0)
        comps = comps * scale
    mu = mean if center else np.zeros_like(mean)

    def fn(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            arr = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            proj = (arr - mu) @ comps
            yield pd.DataFrame(
                {id_col: pdf[id_col], "pca": list(map(list, proj))}
            )

    out_schema = f"{id_col} long, pca array<double>"
    return df.select(id_col, vec_col).mapInPandas(fn, out_schema)
