"""Per-superstep checkpointing with lineage + convergence metrics.

The reference truncates iterative lineage with ``DataFrame.checkpoint()``
(louvain.py:130,138,172,199,207; spark_node2vec.py:338) — write-and-forget,
not resumable, no metrics. The north rule (BASELINE.json:6,14) requires each
superstep to checkpoint frontier + score DataFrames *as tables* with
per-partition lineage and convergence metrics (L1 delta, active-vertex count)
so any run is resumable mid-iteration.

Target layout is an Iceberg table when a catalog is configured (no Iceberg
jars ship in this sandbox — documented fallback): parquet directories plus a
JSON manifest per step, same interface either way.

    <root>/step=<k>/<name>/          parquet snapshot of each DataFrame
    <root>/step=<k>/manifest.json    {step, metrics, tables: {name:
                                      {rows, num_partitions,
                                       partition_rows: [..]}}}
    <root>/LATEST                    text file with the last complete step
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, root: str, spark: SparkSession | None = None):
        self.root = root
        self.spark = spark or SparkSession.getActiveSession()
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------------ write

    def save(self, step: int, tables: dict[str, DataFrame], metrics: dict) -> dict:
        """Write each DataFrame + a manifest; returns the manifest dict.

        Per-partition lineage: row counts per physical partition recorded via
        spark_partition_id(), so a resumed run can verify the snapshot and a
        reader can reason about balance/skew at this step.
        """
        step_dir = os.path.join(self.root, f"step={step}")
        manifest: dict = {"step": step, "metrics": metrics, "tables": {}}
        for name, df in tables.items():
            path = os.path.join(step_dir, name)
            df.write.mode("overwrite").parquet(path)
            part_rows = (
                self.spark.read.parquet(path)
                .groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .orderBy("pid")
                .collect()
            )
            manifest["tables"][name] = {
                "rows": sum(r["count"] for r in part_rows),
                "num_partitions": len(part_rows),
                "partition_rows": [r["count"] for r in part_rows],
                "schema": df.schema.jsonValue(),
            }
        with open(os.path.join(step_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        with open(os.path.join(self.root, "LATEST"), "w") as f:
            f.write(str(step))
        return manifest

    # ------------------------------------------------------------------- read

    def latest_step(self) -> int | None:
        p = os.path.join(self.root, "LATEST")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def manifest(self, step: int) -> dict:
        with open(os.path.join(self.root, f"step={step}", "manifest.json")) as f:
            return json.load(f)

    def load(self, step: int, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, f"step={step}", name))

    def clear(self):
        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)
