"""Spreading-activation influence diffusion, from scratch on DataFrame ops.

Same model as the reference's ``SparkSpreadingActivation``
(``mercury/graph/ml/spark_spreadactivation.py:34-296``), with GraphFrames'
``aggregateMessages`` replaced by its definition — triplets = vertices ⋈
edges ⋈ vertices, per-edge message expressions, groupBy(target).sum — and
the per-row provenance UDF (``udf_add_new_nodes``, :18-27) replaced by
native ``array_distinct(concat(..., flatten(...)))``.

Per directed edge (x → y), per step (spark_spreadactivation.py:211-241):
    msg_to_x = (I(x) / outdeg(x)) · (1 − sf)                 # retained
    msg_to_y = I(x) · sf · t(x,y)                            # transferred
               [+ I(y) / indeg(y)  when outdeg(y) = 0]       # dead ends keep
    t(x,y) = w(x,y) / w_outdeg(x)   ("weighted")
           = 1 / outdeg(x)          ("unweighted")
New influence = Σ incoming messages (vertices receiving no message → 0).

Deviation: the reference silently drops fully-isolated vertices from the
result (its aggregate output is the new vertex table,
spark_spreadactivation.py:266); we keep every node with influence 0.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, ID, SRC, LinkGraph
from linkgraph.session import pin_partitioned, static_plans


def spread_activation(
    graph: LinkGraph,
    seed_nodes: list | DataFrame,
    spreading_factor: float = 0.2,
    transfer_function: str = "weighted",
    steps: int = 1,
    influenced_by: bool = False,
) -> DataFrame:
    """Returns DataFrame[id, influence (, influenced_by: array<id>)]."""
    if transfer_function not in ("weighted", "unweighted"):
        raise ValueError(f"unknown transfer_function {transfer_function!r}")
    with static_plans(graph.edges.sparkSession):
        return _spread_loop(
            graph, seed_nodes, spreading_factor, transfer_function, steps, influenced_by
        )


def _spread_loop(graph, seed_nodes, sf, transfer, steps, influenced_by):
    spark = graph.edges.sparkSession
    if isinstance(seed_nodes, list):
        seeds = spark.createDataFrame([(s,) for s in seed_nodes], [ID])
    else:
        seeds = seed_nodes.select(ID)
    seeds = seeds.withColumn("influence", F.lit(1.0))

    w = graph.weight_col()
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # pinned + pre-partitioned on src: the per-step triple join exchanges
    # the node-sized state sides, not the edge table
    edges = pin_partitioned(
        graph.edges.select(SRC, DST, w.alias("w")).repartition(npart, SRC)
    )

    # degrees, zero-filled (spark_spreadactivation.py:167-198)
    deg = (
        graph.nodes.select(ID)
        .join(edges.groupBy(F.col(SRC).alias(ID)).agg(
            F.count(F.lit(1)).alias("outdeg"), F.sum("w").alias("w_outdeg")), ID, "left")
        .join(edges.groupBy(F.col(DST).alias(ID)).agg(
            F.count(F.lit(1)).alias("indeg")), ID, "left")
        .na.fill(0, ["outdeg", "indeg", "w_outdeg"])
        .localCheckpoint(eager=True)
    )

    v = deg.join(seeds, ID, "left").na.fill(0.0, ["influence"])
    if influenced_by:
        v = v.withColumn(
            "influenced_by",
            F.when(F.col("influence") == 1.0, F.array(F.col(ID))).otherwise(
                F.array().cast(f"array<{dict(v.dtypes)[ID]}>")
            ),
        )
    v = v.localCheckpoint(eager=True)

    for _ in range(steps):
        src_v = v.select(
            F.col(ID).alias("_s"),
            F.col("influence").alias("_si"),
            F.col("outdeg").alias("_so"),
            F.col("w_outdeg").alias("_sw"),
            *([F.col("influenced_by").alias("_sib")] if influenced_by else []),
        )
        dst_v = v.select(
            F.col(ID).alias("_d"),
            F.col("influence").alias("_di"),
            F.col("outdeg").alias("_do"),
            F.col("indeg").alias("_dn"),
        )
        trip = edges.join(src_v, F.col(SRC) == F.col("_s")).join(
            dst_v, F.col(DST) == F.col("_d")
        )

        if transfer == "weighted":
            t = F.col("w") / F.col("_sw")
        else:
            t = F.lit(1.0) / F.col("_so")
        transferred = F.col("_si") * F.lit(sf) * t
        msg_to_dst = F.when(F.col("_do") != 0, transferred).otherwise(
            F.col("_di") / F.col("_dn") + transferred
        )
        msg_to_src = (F.col("_si") / F.col("_so")) * F.lit(1.0 - sf)

        msgs = trip.select(F.col("_s").alias(ID), msg_to_src.alias("msg")).unionByName(
            trip.select(F.col("_d").alias(ID), msg_to_dst.alias("msg"))
        )
        agg = msgs.groupBy(ID).agg(F.sum("msg").alias("_new_influence"))

        new_v = (
            deg.join(agg, ID, "left")
            .na.fill(0.0, ["_new_influence"])
            .withColumnRenamed("_new_influence", "influence")
        )
        if influenced_by:
            prov_msgs = trip.select(F.col("_d").alias(ID), F.col("_sib").alias("_pm"))
            prov = prov_msgs.groupBy(ID).agg(
                F.collect_list("_pm").alias("_new_prov")
            )
            old_prov = v.select(ID, "influenced_by")
            new_v = (
                new_v.join(old_prov, ID, "left")
                .join(prov, ID, "left")
                .withColumn(
                    "influenced_by",
                    F.array_distinct(
                        F.concat(
                            F.coalesce(
                                F.col("influenced_by"),
                                F.array().cast(dict(old_prov.dtypes)["influenced_by"]),
                            ),
                            F.coalesce(
                                F.flatten(F.col("_new_prov")),
                                F.array().cast(dict(old_prov.dtypes)["influenced_by"]),
                            ),
                        )
                    ),
                )
                .drop("_new_prov")
            )
        v = new_v.localCheckpoint(eager=True)

    edges.unpersist()
    cols = [ID, "influence"] + (["influenced_by"] if influenced_by else [])
    return v.select(*cols)
