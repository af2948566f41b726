"""node2vec-style embeddings: N random walks per node → Spark ML Word2Vec.

Same API surface as the reference's ``SparkNode2Vec``
(``mercury/graph/embeddings/spark_node2vec.py:36-353``): sampled walk
starts, weighted next-step sampling, ``num_paths_per_node`` repeats,
Word2Vec fit, ``findSynonyms`` kNN, model save/load, and the walk-block
parquet cache + ``batch_size`` plan-break (:64-79,137-180).

The sampling dataflow is NOT the reference's: its per-src cumulative-weight
window (``sum(weight) over (partitionBy(src) ...)``, :274-295) sorts every
hub's edge list in a single task — the exact skew the north rule targets.
Here next-step sampling is inverse-CDF over a hub-split CSR-style grouped
adjacency:

- edges are grouped once per run into (src, salt, cdf-array) rows, with
  ``split_hubs`` salting sources above ``hub_threshold`` out-degree so a
  10M-edge hub becomes ``buckets`` bounded arrays (linkgraph/skew.py);
- per superstep a walker picks a salt bucket ∝ bucket weight, then an edge
  within the bucket's CDF array — both pure Column expressions
  (``filter``/``element_at`` higher-order functions), no window, no
  per-row Python;
- the per-row cumulative sums are built by one vectorized Arrow
  ``pandas_udf`` at adjacency-build time (numpy cumsum per array).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from linkgraph.base import BaseEstimator
from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans
from linkgraph.skew import SALT, split_hubs

_CDF_TYPE = ArrayType(
    StructType(
        [StructField("dst", StringType()), StructField("cum", DoubleType())]
    )
)
_BUCKET_CDF_TYPE = ArrayType(
    StructType(
        [StructField("salt", IntegerType()), StructField("cum", DoubleType())]
    )
)


def _normalized_cdf(weights: np.ndarray) -> np.ndarray:
    """Cumulative weights normalized to (0, 1], final element pinned to
    exactly 1.0 so an inverse-CDF probe with r < 1 always lands. An all-zero
    weight row degrades to the uniform distribution instead of NaNs (which
    would silently always pick the last edge)."""
    cum = np.cumsum(weights)
    total = cum[-1]
    if total <= 0:
        cum = np.arange(1, len(weights) + 1, dtype=np.float64)
        total = float(len(weights))
    cum = cum / total
    cum[-1] = 1.0
    return cum


@F.pandas_udf(_CDF_TYPE)
def _edge_cdf(pairs: pd.Series) -> pd.Series:
    """Vectorized per-row CDF build: [(dst, w)] → [(dst, cum)]."""
    out = []
    for arr in pairs:
        w = np.fromiter((p["w"] for p in arr), dtype=np.float64, count=len(arr))
        cum = _normalized_cdf(w)
        out.append([{"dst": p["dst"], "cum": float(c)} for p, c in zip(arr, cum)])
    return pd.Series(out)


@F.pandas_udf(_BUCKET_CDF_TYPE)
def _bucket_cdf(pairs: pd.Series) -> pd.Series:
    out = []
    for arr in pairs:
        w = np.fromiter((p["w"] for p in arr), dtype=np.float64, count=len(arr))
        cum = _normalized_cdf(w)
        out.append([{"salt": int(p["salt"]), "cum": float(c)} for p, c in zip(arr, cum)])
    return pd.Series(out)


def _sampling_tables(
    graph: LinkGraph, hub_threshold: int, buckets: int
) -> tuple[DataFrame | None, DataFrame]:
    """(bucket_cdf, adjacency) for skew-free weighted next-step sampling.

    bucket_cdf: one row per source — [id, barr: array<(salt, cum)>], or
        ``None`` when no source exceeds ``hub_threshold`` (every source then
        has the single bucket salt=0 and the per-step bucket pick is skipped).
    adjacency:  one row per (source, salt) — [id, salt, cdf: array<(dst, cum)>]
    """
    w = graph.weight_col()
    e = graph.edges.select(
        F.col(SRC).cast("string").alias(SRC),
        F.col(DST).cast("string").alias(DST),
        w.alias("w"),
    )
    salted = split_hubs(e, key=SRC, degree_threshold=hub_threshold, buckets=buckets)
    grouped = (
        salted.groupBy(SRC, SALT)
        .agg(
            F.collect_list(F.struct(F.col(DST).alias("dst"), F.col("w"))).alias("_pairs"),
            F.sum("w").alias("_wsum"),
        )
    )
    adjacency = grouped.select(
        F.col(SRC).alias(ID),
        F.col(SALT).cast("int").alias("salt"),
        _edge_cdf("_pairs").alias("cdf"),
    ).localCheckpoint(eager=True)
    has_hubs = adjacency.filter(F.col("salt") != 0).limit(1).count() > 0
    if not has_hubs:
        return None, adjacency
    bucket_cdf = (
        grouped.groupBy(SRC)
        .agg(
            F.collect_list(
                F.struct(F.col(SALT).cast("int").alias("salt"), F.col("_wsum").alias("w"))
            ).alias("_bp")
        )
        .select(F.col(SRC).alias(ID), _bucket_cdf("_bp").alias("barr"))
        .localCheckpoint(eager=True)
    )
    return bucket_cdf, adjacency


def _pick(arr_col: str, r_col: str, field: str) -> F.Column:
    """Inverse-CDF probe: first array element with cum >= r (pure JVM HOF)."""
    return F.element_at(
        F.filter(F.col(arr_col), lambda x: x["cum"] >= F.col(r_col)), 1
    )[field]


def node2vec_walks(
    graph: LinkGraph,
    sampling_ratio: float = 1.0,
    num_epochs: int = 10,
    num_paths_per_node: int = 1,
    seed: int = 42,
    hub_threshold: int = 100_000,
    hub_buckets: int = 32,
) -> DataFrame:
    """Generate random walks; returns DataFrame[random_walks: array<string>]
    with walks of length ≥ 2 (spark_node2vec.py:140-142)."""
    with static_plans(graph.edges.sparkSession):
        tables = _sampling_tables(graph, hub_threshold, hub_buckets)
        paths = None
        for run in range(num_paths_per_node):
            p = _one_walk_run(graph, tables, sampling_ratio, num_epochs, seed + 7919 * run)
            paths = p if paths is None else paths.unionByName(p)
        return paths


def _one_walk_run(graph, tables, sampling_ratio, num_epochs, seed):
    bucket_cdf, adjacency = tables

    state = (
        graph.nodes.select(F.col(ID).cast("string").alias(ID))
        .withColumn("_p", F.rand(seed))
        .filter(F.col("_p") <= sampling_ratio)
        .select(ID, F.array(F.col(ID)).alias("path"), F.col(ID).alias("curr"))
        .localCheckpoint(eager=True)
    )

    for i in range(num_epochs):
        # bucket pick ∝ bucket weight, then edge pick within the bucket CDF —
        # both bounded-array probes; no per-src window, hub-skew-free. The
        # bucket join is skipped entirely when the graph has no hubs.
        if bucket_cdf is None:
            with_bucket = state.withColumn("_salt", F.lit(0))
        else:
            with_bucket = (
                state.withColumn("_r1", F.rand(seed + 2 * i + 1))
                .join(bucket_cdf.withColumnRenamed(ID, "_b_id"), F.col("curr") == F.col("_b_id"), "left")
                .withColumn("_salt", _pick("barr", "_r1", "salt"))
                .drop("barr", "_b_id", "_r1")
            )
        stepped = (
            with_bucket.withColumn("_r2", F.rand(seed + 2 * i + 2))
            .join(
                adjacency.withColumnRenamed(ID, "_a_id"),
                (F.col("curr") == F.col("_a_id")) & (F.col("_salt") == F.col("salt")),
                "left",
            )
            .withColumn("_next", _pick("cdf", "_r2", "dst"))
        )
        state = stepped.select(
            ID,
            F.when(F.col("_next").isNotNull(), F.concat("path", F.array(F.col("_next"))))
            .otherwise(F.col("path"))
            .alias("path"),
            F.col("_next").alias("curr"),  # null freezes dead-ended walks
        ).localCheckpoint(eager=True)

    return (
        state.select(F.col("path").alias("random_walks"))
        .filter(F.size("random_walks") > 1)
    )


class Node2Vec(BaseEstimator):
    """Walks + Word2Vec trainer mirroring SparkNode2Vec's API surface,
    including the walk-block parquet cache and ``batch_size`` plan-break
    (spark_node2vec.py:64-79,137-180): with ``path_cache`` set, every
    ``batch_size`` walk runs are written to ``<path_cache>/block=<i>`` and
    the Word2Vec fit reads the cached blocks back — bounding plan/memory
    growth and making walks reusable across fits via ``load_file``."""

    def __init__(
        self,
        dimension: int = 64,
        sampling_ratio: float = 1.0,
        num_epochs: int = 10,
        num_paths_per_node: int = 1,
        batch_size: int | None = None,
        path_cache: str | None = None,
        n_partitions_cache: int = 10,
        w2v_max_iter: int = 1,
        w2v_num_partitions: int = 1,
        w2v_step_size: float = 0.025,
        w2v_min_count: int = 5,
        seed: int = 42,
        hub_threshold: int = 100_000,
        hub_buckets: int = 32,
    ):
        self.dimension = dimension
        self.sampling_ratio = sampling_ratio
        self.num_epochs = num_epochs
        self.num_paths_per_node = num_paths_per_node
        self.batch_size = batch_size
        self.path_cache = path_cache
        self.n_partitions_cache = n_partitions_cache
        self.w2v_max_iter = w2v_max_iter
        self.w2v_num_partitions = w2v_num_partitions
        self.w2v_step_size = w2v_step_size
        self.w2v_min_count = w2v_min_count
        self.seed = seed
        self.hub_threshold = hub_threshold
        self.hub_buckets = hub_buckets

    def _walk_batches(self, graph: LinkGraph):
        """Yield (block_index, walks DataFrame) in batch_size-run blocks.
        The sampling tables depend only on the graph, so they are built ONCE
        and shared by every block."""
        bs = self.batch_size or self.num_paths_per_node
        runs = list(range(self.num_paths_per_node))
        with static_plans(graph.edges.sparkSession):
            tables = _sampling_tables(graph, self.hub_threshold, self.hub_buckets)
            for b, lo in enumerate(range(0, len(runs), bs)):
                paths = None
                for run in runs[lo : lo + bs]:
                    p = _one_walk_run(
                        graph, tables, self.sampling_ratio, self.num_epochs,
                        self.seed + 7919 * run,
                    )
                    paths = p if paths is None else paths.unionByName(p)
                yield b, paths

    @staticmethod
    def _clear_dir(spark, path: str):
        """Clear a walk-cache directory via the Hadoop FS API (portable
        across file:// and object-store schemes, unlike shutil).

        Only ``block=*`` children (this class's own write layout) and marker
        files (``_SUCCESS``-style) are deleted. A directory containing
        anything else is NOT a walk cache — refuse rather than recursively
        destroy a user data directory that ``path_cache`` was mistakenly
        pointed at."""
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            return
        children = list(fs.listStatus(hpath))
        names = [c.getPath().getName() for c in children]
        foreign = [
            nm
            for nm in names
            if not (nm.startswith("block=") or nm.startswith("_") or nm.startswith("."))
        ]
        if foreign:
            raise ValueError(
                f"path_cache {path!r} contains non-walk-cache entries "
                f"{foreign[:5]}; refusing to clear it — point path_cache at "
                "an empty or dedicated directory"
            )
        for c in children:
            fs.delete(c.getPath(), True)

    def fit(self, graph: LinkGraph):
        from pyspark.ml.feature import Word2Vec

        spark = graph.edges.sparkSession
        if self.path_cache:
            # clear any previous fit's blocks first: a re-fit with a larger
            # batch_size writes fewer blocks, and the block=* read-back would
            # otherwise mix stale walk generations into the Word2Vec fit
            self._clear_dir(spark, self.path_cache)
            for b, paths in self._walk_batches(graph):
                paths.coalesce(self.n_partitions_cache).write.mode(
                    "overwrite"
                ).parquet(f"{self.path_cache}/block={b}")
            self.paths_ = spark.read.parquet(f"{self.path_cache}/block=*")
        else:
            all_paths = None
            for _b, paths in self._walk_batches(graph):
                paths = paths.localCheckpoint(eager=True)  # plan-break per block
                all_paths = paths if all_paths is None else all_paths.unionByName(paths)
            self.paths_ = all_paths.persist()
        w2v = Word2Vec(
            vectorSize=self.dimension,
            maxIter=self.w2v_max_iter,
            numPartitions=self.w2v_num_partitions,
            stepSize=self.w2v_step_size,
            inputCol="random_walks",
            outputCol="model",
            minCount=self.w2v_min_count,
            seed=self.seed,
        )
        self.node2vec_ = w2v.fit(self.paths_)
        return self

    @classmethod
    def load_file(cls, path_cache: str, spark=None, **kwargs) -> "Node2Vec":
        """Fit Word2Vec from previously cached walk blocks without re-walking
        (spark_node2vec.py:104-111 ``load_file`` semantics)."""
        from pyspark.ml.feature import Word2Vec
        from pyspark.sql import SparkSession

        obj = cls(path_cache=path_cache, **kwargs)
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("load_file needs an active SparkSession (or spark=)")
        obj.paths_ = spark.read.parquet(f"{path_cache}/block=*")
        w2v = Word2Vec(
            vectorSize=obj.dimension,
            maxIter=obj.w2v_max_iter,
            numPartitions=obj.w2v_num_partitions,
            stepSize=obj.w2v_step_size,
            inputCol="random_walks",
            outputCol="model",
            minCount=obj.w2v_min_count,
            seed=obj.seed,
        )
        obj.node2vec_ = w2v.fit(obj.paths_)
        return obj

    def embedding(self) -> DataFrame | None:
        if not hasattr(self, "node2vec_"):
            return None
        return self.node2vec_.getVectors()

    def get_most_similar_nodes(self, node_id, k: int = 5) -> DataFrame | None:
        if not hasattr(self, "node2vec_"):
            return None
        return self.node2vec_.findSynonyms(str(node_id), k)

    def save(self, file_name: str):
        if hasattr(self, "node2vec_"):
            self.node2vec_.save(file_name)

    @classmethod
    def load(cls, file_name: str) -> "Node2Vec":
        from pyspark.ml.feature import Word2VecModel

        obj = cls()
        obj.node2vec_ = Word2VecModel.load(file_name)
        return obj
