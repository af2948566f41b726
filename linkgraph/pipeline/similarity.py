"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force cosine top-k — the exact baseline. Dot products
  via JVM higher-order functions (zip_with + aggregate), no UDF; the query
  side is broadcast so the scan is shuffle-free.
- lsh_cosine_topk: random-hyperplane LSH bucketing as the scale path —
  candidates share a signature band with the query; exact cosine re-ranking
  within candidates. Deterministic seeded hyperplanes (splitmix64), built as
  an Arrow pandas_udf batch kernel.
"""

from __future__ import annotations

import math
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from linkgraph.base import BaseEstimator
from pyspark.sql.types import ArrayType, IntegerType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_expr(a, b) -> F.Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    emb: DataFrame,
    query_id,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against the embedding of ``query_id``.
    Raises if ``query_id`` matches no (or several) rows — a typo'd id
    must not masquerade as an empty result (the quantized_cosine_topk
    contract)."""
    q = emb.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("_q"))
    nq = q.limit(2).count()
    if nq != 1:
        raise ValueError(
            f"query_id {query_id!r} matches {'no' if nq == 0 else 'multiple'} "
            f"rows in {id_col!r}"
        )
    scored = emb.crossJoin(F.broadcast(q)).select(
        id_col, cosine_expr(vec_col, "_q").alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-Gaussian hyperplanes from splitmix64 bits.

    Draws 4 independent uniforms PER coefficient (4·dim·n_planes total) and
    sums them (Irwin–Hall ≈ gaussian, plenty for sign tests), so every plane
    is distinct — a shorter draw tiled across planes would silently repeat
    bands and duplicate LSH buckets.
    """
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    gamma = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    idx = np.arange(4 * dim * n_planes, dtype=np.uint64) + gamma
    z = idx
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & mask
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & mask
    z = z ^ (z >> np.uint64(31))
    u = (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)  # U(0,1)
    g = u.reshape(-1, 4).sum(axis=1) - 2.0  # centered Irwin-Hall(4)
    return g.reshape(n_planes, dim)


def hyperplane_signature(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Adds ``bits``: array<int> of hyperplane sign bits — Arrow batch kernel."""
    probe = emb.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if probe is None:
        # zero vectors to sign — return the empty result the brute path
        # would produce instead of TypeError-ing on None[0]
        return emb.select(
            id_col, vec_col, F.lit(None).cast("array<int>").alias("bits")
        ).limit(0)
    dim = len(probe[0])
    planes = _planes(dim, n_planes, seed)

    @F.pandas_udf(ArrayType(IntegerType()))
    def signs(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (mat.astype(np.float64) @ planes.T > 0).astype(np.int32)
        return pd.Series(list(bits))

    return emb.select(id_col, vec_col, signs(F.col(vec_col)).alias("bits"))


class IVFIndex(BaseEstimator):
    """Inverted-file (IVF) approximate cosine search — the second scale path
    next to hyperplane LSH: a KMeans coarse quantizer partitions the corpus
    into ``n_centroids`` inverted lists; a query probes only the ``n_probe``
    nearest lists and exact-reranks within them.

    Build: one KMeans fit (seeded, pyspark.ml) + one scan to assign list ids.
    Two storage layouts:

    - ``index_path=None`` (default): the assigned table is hash-partitioned
      by list id and persisted in memory. A probe's ``filter(_list.isin(...))``
      is evaluated per cached block — cheap, but every block is touched.
      This is the bench/interactive layout; it does NOT file-prune.
    - ``index_path=<dir>``: the table is written as parquet PARTITIONED BY
      ``_list`` and read back, so a probe's list filter becomes a Catalyst
      partition filter — only n_probe/n_centroids of the FILES are read.
      This is the 100 TB layout (asserted by a plan test).

    Metric pairing: the coarse quantizer is EUCLIDEAN KMeans over raw
    vectors while probe selection and reranking are cosine — the standard
    FAISS IVF-flat pairing, which is exact-equivalent only when vectors
    are L2-normalized. For unnormalized embeddings with heterogeneous
    norms, lists partition partly by magnitude and a cosine-near vector
    can hide in an unprobed list: normalize upstream (or raise n_probe)
    when recall matters on such data.

    Search: centroid distances are computed driver-side (n_centroids is
    small by design), the probed lists are pruned as above, reranked with
    JVM HOF cosine.
    """

    def __init__(
        self,
        n_centroids: int = 16,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        index_path: str | None = None,
    ):
        self.n_centroids = n_centroids
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col
        self.index_path = index_path

    def fit(self, emb: DataFrame) -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = emb.select(
            self.id_col,
            self.vec_col,
            array_to_vector(
                F.transform(F.col(self.vec_col), lambda x: x.cast("double"))
            ).alias("_fv"),
        )
        km = KMeans(k=self.n_centroids, seed=self.seed, featuresCol="_fv",
                    predictionCol="_list")
        self.model_ = km.fit(feats)
        self.centroids_ = [list(map(float, c)) for c in self.model_.clusterCenters()]
        assigned = self.model_.transform(feats).select(
            self.id_col, self.vec_col, "_list"
        )
        if self.index_path:
            # one physical directory per inverted list → probes prune files
            assigned.repartition(self.n_centroids, "_list").write.mode(
                "overwrite"
            ).partitionBy("_list").parquet(self.index_path)
            self.lists_ = emb.sparkSession.read.parquet(self.index_path)
        else:
            self.lists_ = assigned.repartition(self.n_centroids, "_list").persist()
            self.lists_.count()
        return self

    def search(self, query_vec: list, k: int = 10, n_probe: int = 4) -> DataFrame:
        """Exact-cosine top-k within the n_probe nearest inverted lists."""
        import math

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a)) or 1.0
            nb = math.sqrt(sum(x * x for x in b)) or 1.0
            return dot / (na * nb)

        probes = sorted(
            range(len(self.centroids_)),
            key=lambda i: -cos(query_vec, self.centroids_[i]),
        )[:n_probe]
        spark = self.lists_.sparkSession
        q = spark.createDataFrame(
            [([float(x) for x in query_vec],)], f"_q array<double>"
        )
        cand = self.lists_.filter(F.col("_list").isin(probes))
        scored = cand.crossJoin(F.broadcast(q)).select(
            self.id_col, cosine_expr(self.vec_col, "_q").alias("cosine")
        )
        return scored.orderBy(F.desc("cosine"), F.asc(self.id_col)).limit(k)

    def search_id(self, query_id, k: int = 10, n_probe: int = 4) -> DataFrame:
        row = self.lists_.filter(F.col(self.id_col) == query_id).select(self.vec_col).first()
        if row is None:
            raise KeyError(f"{self.id_col}={query_id!r} not in index")
        return self.search([float(x) for x in row[0]], k=k, n_probe=n_probe)


def lsh_cosine_topk(
    emb: DataFrame,
    query_id,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    band_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 LSH band with the query,
    re-ranked by exact cosine. Recall grows with bands (n_planes/band_planes).
    Raises if ``query_id`` matches no (or several) rows — a typo'd id
    must not masquerade as an empty result (the quantized_cosine_topk
    contract)."""
    assert n_planes % band_planes == 0
    nq = emb.filter(F.col(id_col) == query_id).limit(2).count()
    if nq != 1:
        raise ValueError(
            f"query_id {query_id!r} matches {'no' if nq == 0 else 'multiple'} "
            f"rows in {id_col!r}"
        )
    bands = n_planes // band_planes
    sig = hyperplane_signature(emb, id_col, vec_col, n_planes, seed)
    band_col = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(F.slice(F.col("bits"), b * band_planes + 1, band_planes), b),
        )
    )
    banded = sig.select(id_col, vec_col, band_col.alias("band", "bucket"))
    qb = banded.filter(F.col(id_col) == query_id).select(
        F.col("band").alias("qband"), F.col("bucket").alias("qbucket")
    )
    q = emb.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("_q"))
    cand = (
        banded.join(
            F.broadcast(qb),
            (F.col("band") == F.col("qband")) & (F.col("bucket") == F.col("qbucket")),
            "leftsemi",
        )
        .select(id_col, vec_col)
        .dropDuplicates([id_col])
    )
    scored = cand.crossJoin(F.broadcast(q)).select(
        id_col, cosine_expr(vec_col, "_q").alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector scalar quantization (the standard int8 ANN
    compression): scale = max(|v_i|), q_i = round(v_i / scale · L) with
    L = 2^(bits−1) − 1, stored as ``array<tinyint>`` for bits=8 — a 4×
    memory cut that makes 100 TB of fp32 vectors a 25 TB scan.

    Zero vectors quantize to all-zero (scale 0 guarded). Pure JVM
    higher-order functions over the scan — no shuffle, no UDF. Returns the
    input plus ``q_scale`` (double) and ``q_<vec_col>``.

    :func:`dequantize_expr` is the inverse; the round-trip error bound is
    scale/(2L) per coordinate.
    """
    if not 2 <= bits <= 8:
        raise ValueError(f"bits must be in [2, 8], got {bits}")
    levels = (1 << (bits - 1)) - 1
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    q = F.transform(
        v,
        lambda x: F.when(
            scale > 0, F.round(x.cast("double") / scale * levels)
        )
        .otherwise(F.lit(0.0))
        .cast("tinyint"),
    )
    return emb.select(
        "*", scale.alias("q_scale"), q.alias(f"q_{vec_col}")
    )


def dequantize_expr(q_col: str, scale_col: str, bits: int = 8) -> F.Column:
    """array<double> reconstruction of a quantized column: q_i · scale / L."""
    levels = (1 << (bits - 1)) - 1
    s = F.col(scale_col)
    return F.transform(
        F.col(q_col), lambda y: y.cast("double") * s / F.lit(float(levels))
    )


def quantized_cosine_topk(
    emb: DataFrame,
    query_id,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    round_scores: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine over int8-quantized vectors — the scan side of
    a quantized ANN: cosine is invariant under the per-vector positive
    scale, so ranking on the integer vectors equals ranking on the
    dequantized ones, while the scan reads 1/4 the bytes. Integer dot and
    squared norms stay exact (≤ dim·127² per vector, far inside int); the
    final divide is the only float op. Returns [id, q_cosine].

    ``round_scores=d`` rounds the cosine to d decimals BEFORE the top-k cut
    so boundary ties resolve by id identically across engines/runs (the
    raw-double order at the k-th position is not portable when two values
    round equal). Raises if ``query_id`` matches no (or several) rows —
    a typo'd id must not masquerade as an empty result."""
    q = quantize_embeddings(emb.select(id_col, vec_col), vec_col, bits=bits)
    qv = f"q_{vec_col}"
    qrow = q.filter(F.col(id_col) == query_id).select(F.col(qv).alias("_qq"))
    nq = qrow.limit(2).count()
    if nq != 1:
        raise ValueError(
            f"query_id {query_id!r} matches {'no' if nq == 0 else 'multiple'} "
            f"rows in {id_col!r}"
        )
    dot = F.aggregate(
        F.zip_with(F.col(qv), F.col("_qq"), lambda a, b: a.cast("int") * b.cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.col(c), F.lit(0), lambda acc, x: acc + x.cast("int") * x.cast("int")
    )
    na, nb = sq(qv), sq("_qq")
    cos = F.when(
        (na > 0) & (nb > 0),
        dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))),
    ).otherwise(F.lit(0.0))
    scored = q.crossJoin(F.broadcast(qrow)).select(
        id_col, cos.alias("q_cosine")
    )
    if round_scores is not None:
        scored = scored.select(
            id_col, F.round("q_cosine", round_scores).alias("q_cosine")
        )
    return scored.orderBy(F.desc("q_cosine"), F.asc(id_col)).limit(k)


def random_projection(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    seed: str = "rp",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction with a DETERMINISTIC
    Rademacher sign matrix: y_j = (1/√k)·Σ_d sign(j,d)·x_d where
    sign(j,d) = +1 iff the first hex digit of md5('<seed>:<j>:<d>') < '8'.
    Returns DataFrame[id_col, projection: array<double>].

    The sign matrix is a pure function of (seed, j, d), so two runs — or
    two ENGINES — project identically (the DuckDB oracle replays it
    byte-for-byte); no RNG state, no broadcast needed. Entirely
    higher-order functions over the vector column: zero shuffle, zero UDF
    — scan-bound at 100 TB. The md5-per-element cost (k·D digests/row) is
    the price of engine portability; a production variant would
    precompute the k×D sign matrix once and broadcast it, same output.
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    import re as _re

    # both strings are interpolated into a SQL expression (kept textual so
    # the DuckDB oracle replays it byte-for-byte) — constrain them so a
    # quote can neither break parsing nor inject SQL
    if not _re.fullmatch(r"[A-Za-z0-9_.-]+", seed):
        raise ValueError(
            f"seed must match [A-Za-z0-9_.-]+ (got {seed!r}); it is "
            "interpolated into a SQL expression"
        )
    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", vec_col):
        raise ValueError(f"vec_col must be a plain identifier (got {vec_col!r})")
    inv = 1.0 / math.sqrt(out_dim)
    terms = [
        (
            F.expr(
                f"aggregate(transform({vec_col}, (x, i) -> "
                f"CASE WHEN substring(md5(concat('{seed}:{j}:', cast(i AS string))), 1, 1) < '8' "
                f"THEN cast(x AS double) ELSE -cast(x AS double) END), "
                f"cast(0.0 AS double), (a, b) -> a + b)"
            )
            * F.lit(inv)
        ).alias(f"_y{j}")
        for j in range(out_dim)
    ]
    return emb.select(F.col(id_col), *terms).select(
        id_col, F.array(*[f"_y{j}" for j in range(out_dim)]).alias("projection")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    max_df: int | None = None,
    min_sim: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse TF-IDF cosine similarity join via an inverted index:
    DataFrame[d1, d2, sim] (d1 < d2) for every document pair sharing ≥1
    surviving term — the sparse-vector counterpart to the dense ANN paths
    (cosine_topk/LSH/IVF), and the standard "similar documents" primitive
    when no embedding exists.

    Plan: tokenize → per-(doc, term) tf aggregate → df aggregate (broadcast
    back) → per-doc L2 norms → inverted-index self-join on term → ONE
    algebraic dot-product aggregate per pair. No windows, no Python.

    ``max_df`` drops terms appearing in more than that many documents from
    the JOIN ONLY (norms keep every term, so surviving similarities are
    exact, never inflated): stop-word-grade terms are what makes the
    inverted-index self-join quadratic — the cap is the documented
    recall/cost trade, same shape as ngram_jaccard's shingle-frequency cap.
    ``min_sim`` filters the output (boundary floats compare engine-side;
    leave None when hash-comparing against an external replay).

    idf = ln(N / df); weights tf·idf; cosine = Σ w1·w2 / (‖w1‖·‖w2‖)."""
    from linkgraph.pipeline.text import _words_col

    tok = df.select(
        F.col(id_col).alias("d"), F.explode(_words_col(text_col)).alias("term")
    )
    tf = tok.groupBy("d", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = (
        tf.join(F.broadcast(dfreq), "term")
        .select(
            "d",
            "term",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
            ).alias("w"),
        )
    )
    norms = w.groupBy("d").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    joinable = w if max_df is None else w.filter(F.col("df") <= max_df)
    left = joinable.select("term", F.col("d").alias("d1"), F.col("w").alias("w1"))
    right = joinable.select("term", F.col("d").alias("d2"), F.col("w").alias("w2"))
    dots = (
        left.join(right, "term")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    out = (
        dots.join(norms.select(F.col("d").alias("d1"), F.col("nrm").alias("n1")), "d1")
        .join(norms.select(F.col("d").alias("d2"), F.col("nrm").alias("n2")), "d2")
        .select(
            "d1",
            "d2",
            (F.col("dot") / (F.col("n1") * F.col("n2"))).alias("sim"),
        )
    )
    if min_sim is not None:
        out = out.filter(F.col("sim") >= min_sim)
    return out


def knn_graph(
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "brute",
    n_planes: int = 16,
    band_planes: int = 4,
    seed: int = 42,
    max_bucket: int = 2000,
    mutual: bool = False,
) -> DataFrame:
    """k-nearest-neighbor GRAPH over an embedding column: DataFrame
    [src, dst, cosine] with up to k out-edges per vector — the semantic
    near-duplicate primitive (feed the edges into connected_components or
    louvain_communities to get duplicate/topic clusters), and the ANN-join
    counterpart of the single-query searches (cosine_topk / lsh / IVF).

    ``method="brute"``: exact — normalize once, all-pairs dot of unit
    vectors. O(n²) comparisons: the correctness baseline and the oracle
    path, fine to ~10⁵ vectors.

    ``method="lsh"``: hyperplane-banded — candidates are pairs sharing at
    least one of n_planes/band_planes band buckets (recall < 1, grows with
    bands), reranked by exact cosine. Pathological buckets (near-duplicate
    floods) are capped at ``max_bucket`` members by the same order-free
    hash-mod filter as the minhash join — bucket sizes from an algebraic
    aggregate, no sort, no single-task concentration — so the within-bucket
    join is bounded: this is the 100 TB path.

    Per-src top-k runs as row_number ≤ k, which Spark executes as a
    Partial WindowGroupLimit: every map task forwards at most k rows per
    src before the shuffle, so hub sources never materialize their full
    candidate set in one task. Ties break by ascending dst (deterministic).
    Zero-norm vectors are dropped (cosine undefined). ``mutual=True``
    keeps only edges whose reverse also survived — the symmetric kNN graph
    most clustering recipes want."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if method not in ("brute", "lsh"):
        raise ValueError(f"method must be 'brute' or 'lsh', got {method!r}")
    from pyspark.sql import Window

    nrm = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    unit = emb.filter(nrm > 0).select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm).alias("_u"),
    )
    if method == "brute":
        a, b = unit.alias("a"), unit.alias("b")
        pairs = (
            a.crossJoin(b)
            .filter(F.col("a._id") != F.col("b._id"))
            .select(
                F.col("a._id").alias("src"),
                F.col("b._id").alias("dst"),
                F.col("a._u").alias("_ua"),
                F.col("b._u").alias("_ub"),
            )
        )
    else:
        assert n_planes % band_planes == 0
        bands = n_planes // band_planes
        sig = hyperplane_signature(emb, id_col, vec_col, n_planes, seed)
        banded = sig.select(
            F.col(id_col).alias("_id"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda bnd: F.xxhash64(
                        F.slice(F.col("bits"), bnd * band_planes + 1, band_planes),
                        bnd,
                    ),
                )
            ).alias("band", "bucket"),
        )
        sizes = banded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        capped = (
            banded.join(sizes, ["band", "bucket"])
            .filter(
                (F.col("_bsz") <= max_bucket)
                | (F.pmod(F.xxhash64("_id", "band"), F.col("_bsz")) < max_bucket)
            )
            .drop("_bsz")
        )
        ca, cb = capped.alias("ca"), capped.alias("cb")
        cand = (
            ca.join(
                cb,
                (F.col("ca.band") == F.col("cb.band"))
                & (F.col("ca.bucket") == F.col("cb.bucket"))
                & (F.col("ca._id") != F.col("cb._id")),
            )
            .select(F.col("ca._id").alias("_s"), F.col("cb._id").alias("_d"))
            .distinct()
        )
        a = unit.select(F.col("_id").alias("_s"), F.col("_u").alias("_ua"))
        b = unit.select(F.col("_id").alias("_d"), F.col("_u").alias("_ub"))
        pairs = (
            cand.join(a, "_s")
            .join(b, "_d")
            .select(
                F.col("_s").alias("src"),
                F.col("_d").alias("dst"),
                "_ua",
                "_ub",
            )
        )
    scored = pairs.select(
        "src", "dst", _dot(F.col("_ua"), F.col("_ub")).alias("cosine")
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    out = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
    if mutual:
        rev = out.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        out = out.join(rev, ["src", "dst"], "leftsemi")
    return out


def kmeans_clusters(
    emb: DataFrame,
    k: int,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means over an embedding column:
    DataFrame[id, cluster] — the corpus-bucketing primitive (group documents
    by embedding region for balanced sharding, curriculum mixes, per-cluster
    sampling). Unlike ``pyspark.ml.KMeans`` (RNG init, convergence-dependent
    iteration count) every step is a pure function of the input, so runs are
    reproducible across partitionings AND replayable by an external SQL
    engine: init = the k smallest-id vectors, exactly ``n_iter`` centroid
    updates, assignment = squared-L2 argmin with ties to the lowest
    centroid index, empty clusters keep their previous centroid.

    Determinism caveat (honest bound): the centroid update averages
    float64 cell values with a distributed sum, whose accumulation order
    follows the partitioning — centroids can differ in the last ulps
    between partitionings, and a point EXACTLY on a cluster boundary
    could then flip. The structural choices (seedless init, fixed
    iteration count, deterministic ties) remove every discrete source of
    divergence; the floating-point residual is the same one any
    distributed mean carries, and the oracle fixture pins it in practice.

    Scale shape: per iteration ONE scan assigns points (distances via JVM
    zip_with/aggregate against the centroid matrix inlined as literals — no
    Python, no window, no join) and ONE algebraic (cluster, dim) aggregate
    reduces to k·d cell averages, which are collected driver-side (k·d
    scalars — the classic Lloyd reduction, independent of row count). The
    returned assignment is one final scan against the last centroids.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    pts = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    init = pts.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"k={k} exceeds the {len(init)} input vectors")
    centroids = [list(r["_v"]) for r in init]

    def _assign(df):
        dists = [
            F.aggregate(
                F.zip_with(
                    F.col("_v"),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
        arr = F.array(*dists)
        # array_position returns the FIRST index of the min → ties break to
        # the lowest cluster id, 1-based hence the -1
        return df.withColumn(
            "cluster", (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        )

    d = len(centroids[0])
    for _ in range(n_iter):
        cells = (
            _assign(pts)
            .select("cluster", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("cx"))
            .collect()
        )
        by_c: dict[int, list[float]] = {}
        for r in cells:
            by_c.setdefault(r["cluster"], [0.0] * d)[r["pos"]] = r["cx"]
        # empty cluster → previous centroid survives
        centroids = [by_c.get(j, centroids[j]) for j in range(k)]
    return _assign(pts).select(id_col, "cluster")
