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

All small-file IO (manifest.json, LATEST) goes through the session's Hadoop
``FileSystem`` — the checkpoint root lives wherever the cluster writes
(HDFS/S3/local alike), so driver-local ``open()``/``os.path`` would split
the snapshot across two filesystems and break resume from another driver.

``partition_rows`` records the WRITE-side layout (row counts per partition
of the DataFrame being saved — each non-empty partition writes one file),
not a re-read scan split: a read-back count would depend on the reader's
``spark.sql.files.maxPartitionBytes`` and spuriously mismatch across
sessions.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, root: str, spark: SparkSession | None = None):
        # strip trailing slashes only while a path component remains:
        # root='/' (or 'hdfs:///') must not collapse to an empty string,
        # which Hadoop Path construction rejects (ADVICE r5)
        stripped = root.rstrip("/")
        if not stripped or stripped.endswith(":"):
            stripped = root  # bare '/' or scheme root like 'hdfs:///'
        self.root = stripped
        self.spark = spark or SparkSession.getActiveSession()
        fs, p, _ = self._fs(self.root)
        fs.mkdirs(p)

    # ------------------------------------------------------------- hadoop fs

    def _fs(self, path: str):
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(self.spark._jsc.hadoopConfiguration()), p, jvm

    def _write_text(self, path: str, text: str) -> None:
        fs, p, _ = self._fs(path)
        out = fs.create(p, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def _read_text(self, path: str) -> str | None:
        fs, p, jvm = self._fs(path)
        if not fs.exists(p):
            return None
        ins = fs.open(p)
        try:
            # commons-io ships inside Spark's JVM classpath
            return jvm.org.apache.commons.io.IOUtils.toString(ins, "UTF-8")
        finally:
            ins.close()

    # ------------------------------------------------------------------ write

    def save(self, step: int, tables: dict[str, DataFrame], metrics: dict) -> dict:
        """Write each DataFrame + a manifest; returns the manifest dict.

        Per-partition lineage: row counts per physical partition of the
        DataFrame being written (``spark_partition_id()`` over ``df``
        itself — the write-side layout, stable across reader configs), so
        a resumed run can verify the snapshot and a reader can reason
        about balance/skew at this step.
        """
        step_dir = f"{self.root}/step={step}"
        manifest: dict = {"step": step, "metrics": metrics, "tables": {}}
        for name, df in tables.items():
            path = f"{step_dir}/{name}"
            df.write.mode("overwrite").parquet(path)
            part_rows = (
                df.groupBy(F.spark_partition_id().alias("pid"))
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
        self._write_text(f"{step_dir}/manifest.json", json.dumps(manifest))
        self._write_text(f"{self.root}/LATEST", str(step))
        return manifest

    # ------------------------------------------------------------------- read

    def latest_step(self) -> int | None:
        text = self._read_text(f"{self.root}/LATEST")
        return None if text is None else int(text.strip())

    def manifest(self, step: int) -> dict:
        text = self._read_text(f"{self.root}/step={step}/manifest.json")
        if text is None:
            raise FileNotFoundError(
                f"no manifest for step {step} under {self.root}"
            )
        return json.loads(text)

    def load(self, step: int, name: str) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/step={step}/{name}")

    def clear(self):
        fs, p, _ = self._fs(self.root)
        fs.delete(p, True)
        fs.mkdirs(p)
