"""node2vec-style embeddings: N random walks per node → Spark ML Word2Vec.

Same skeleton as the reference's ``SparkNode2Vec``
(``mercury/graph/embeddings/spark_node2vec.py:36-353``), which is already
idiomatic Spark and is reused as-is where sound:

- walk starts: sample nodes with rand ≤ sampling_ratio (:258-272)
- weighted next-step sampling by inverse CDF: per-src cumulative weight
  window ``sum(weight) over (partitionBy(src).orderBy(dst)
  .rangeBetween(unboundedPreceding, 0))`` ÷ per-src total (:274-295), then
  ``rand ≤ norm_cumsum`` filter + row_number pick-first (:299-330)
- one walk per start node per run; ``num_paths_per_node`` via repeated runs
  (:152-169); paths of length 1 (dead-end starts) dropped (:140-142)
- ``pyspark.ml.feature.Word2Vec`` on the paths (:182-194); kNN via
  ``findSynonyms`` (:220-234); save/load via Word2VecModel (:236-256)

Replaced: the per-row Python UDF path append (``udf_select_element_2``,
:22-29) → native ``concat``/``when`` Column expressions; unseeded ``rand``
(:263,304) → seeded per (run, epoch) for reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import static_plans


def node2vec_walks(
    graph: LinkGraph,
    sampling_ratio: float = 1.0,
    num_epochs: int = 10,
    num_paths_per_node: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Generate random walks; returns DataFrame[random_walks: array<string>]
    with walks of length ≥ 2 (spark_node2vec.py:140-142)."""
    with static_plans(graph.edges.sparkSession):
        paths = None
        for run in range(num_paths_per_node):
            p = _one_walk_run(graph, sampling_ratio, num_epochs, seed + 7919 * run)
            paths = p if paths is None else paths.unionByName(p)
        return paths


def _one_walk_run(graph, sampling_ratio, num_epochs, seed):
    w = graph.weight_col()
    cum = Window.partitionBy(SRC).orderBy(DST).rangeBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(SRC)
    edges = (
        graph.edges.select(
            F.col(SRC).cast("string").alias(SRC),
            F.col(DST).cast("string").alias(DST),
            (F.sum(w).over(cum) / F.sum(w).over(tot)).alias("norm_cumsum"),
        )
        .localCheckpoint(eager=True)
    )

    state = (
        graph.nodes.select(F.col(ID).cast("string").alias(ID))
        .withColumn("_p", F.rand(seed))
        .filter(F.col("_p") <= sampling_ratio)
        .select(ID, F.array(F.col(ID)).alias("path"), F.col(ID).alias("curr"))
        .localCheckpoint(eager=True)
    )

    for i in range(num_epochs):
        cand = state.withColumn("_r", F.rand(seed + i + 1))
        joined = cand.join(edges, cand["curr"] == edges[SRC], "left").filter(
            (F.col("_r") <= F.col("norm_cumsum")) | F.isnull("norm_cumsum")
        )
        pick = Window.partitionBy(ID).orderBy(F.asc("norm_cumsum"))
        state = (
            joined.withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") == 1)
            .select(
                ID,
                F.when(
                    F.col(DST).isNotNull(), F.concat("path", F.array(F.col(DST)))
                )
                .otherwise(F.col("path"))
                .alias("path"),
                F.col(DST).alias("curr"),  # null freezes dead-ended walks
            )
            .localCheckpoint(eager=True)
        )

    return (
        state.select(F.col("path").alias("random_walks"))
        .filter(F.size("random_walks") > 1)
    )


class Node2Vec:
    """Walks + Word2Vec trainer mirroring SparkNode2Vec's API surface."""

    def __init__(
        self,
        dimension: int = 64,
        sampling_ratio: float = 1.0,
        num_epochs: int = 10,
        num_paths_per_node: int = 1,
        w2v_max_iter: int = 1,
        w2v_num_partitions: int = 1,
        w2v_step_size: float = 0.025,
        w2v_min_count: int = 5,
        seed: int = 42,
    ):
        self.dimension = dimension
        self.sampling_ratio = sampling_ratio
        self.num_epochs = num_epochs
        self.num_paths_per_node = num_paths_per_node
        self.w2v_max_iter = w2v_max_iter
        self.w2v_num_partitions = w2v_num_partitions
        self.w2v_step_size = w2v_step_size
        self.w2v_min_count = w2v_min_count
        self.seed = seed

    def fit(self, graph: LinkGraph):
        from pyspark.ml.feature import Word2Vec

        self.paths_ = node2vec_walks(
            graph,
            self.sampling_ratio,
            self.num_epochs,
            self.num_paths_per_node,
            self.seed,
        ).persist()
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
