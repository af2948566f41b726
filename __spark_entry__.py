"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: PageRank over the supplier co-purchase graph
                derived from sf0.001 lineitem (rank suppliers by link
                centrality), the minimum end-to-end slice of SURVEY.md §7.3.
queries()     — one entry per implemented operator (SURVEY.md §2 + training-
                data ops); each callable (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-runnable ANSI SQL equivalents; iterative fixpoint ops
                (converged PageRank, LPA) are omitted → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from linkgraph import LinkGraph, pagerank
    from linkgraph.queries import copurchase_edges

    g = LinkGraph(copurchase_edges(spark, "/root/testdata/sf0.001"), keys={"directed": False})
    res = pagerank(g, tol=1e-6, max_iter=60, use_arrow_kernel=False)
    return res.ranks.select(
        "id", F.round(F.col("pagerank") * 1e6).cast("long").alias("pr_millionths")
    ).orderBy(F.desc("pr_millionths"), F.asc("id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from linkgraph.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from linkgraph.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
