"""Per-partition lineage + metrics for checkpoint-resumable jobs.

Every materialization step can record, per Spark partition, how many
rows/points it produced and under which job/snapshot id.  The metrics
table is itself a small parquet table; a resumable job consults it to
decide which buckets are already done (the parquet stand-in for Iceberg
snapshot metadata + a manifest-level audit table).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

METRICS_COLS = ["job_id", "step", "partition_id", "rows", "wall_ts"]


def partition_metrics(df: DataFrame, job_id: str, step: str) -> DataFrame:
    """Rows-per-partition summary of ``df`` (triggers one pass)."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id").agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("job_id", F.lit(job_id))
        .withColumn("step", F.lit(step))
        .withColumn("wall_ts", F.current_timestamp())
        .select(*METRICS_COLS)
    )


def record_lineage(df: DataFrame, job_id: str, step: str,
                   metrics_path: str) -> None:
    """Append this step's per-partition metrics to the metrics table."""
    partition_metrics(df, job_id, step).write.mode("append").parquet(
        metrics_path)


def read_lineage(spark: SparkSession, metrics_path: str) -> DataFrame:
    return spark.read.parquet(metrics_path)


def completed_steps(spark: SparkSession, metrics_path: str, job_id: str
                    ) -> set[str]:
    """Steps already recorded for ``job_id`` — the resume manifest."""
    if not Path(metrics_path).exists():
        return set()
    rows = (read_lineage(spark, metrics_path)
            .filter(F.col("job_id") == job_id)
            .select("step").distinct().collect())
    return {r["step"] for r in rows}


class ResumableJob:
    """Tiny checkpoint/resume orchestrator.

    Each ``step(name, fn)`` runs ``fn()`` (which must persist its own
    output) only if the step is not present in the metrics table for this
    job_id, then records lineage over the returned DataFrame.  Re-running
    the same job_id after a crash skips completed steps.
    """

    def __init__(self, spark: SparkSession, job_id: str, metrics_path: str):
        self.spark = spark
        self.job_id = job_id
        self.metrics_path = metrics_path
        self._done = completed_steps(spark, metrics_path, job_id)

    def step(self, name: str, fn, force: bool = False) -> bool:
        """Returns True if the step executed, False if skipped.
        ``force`` re-runs a completed step (e.g. an operator-requested
        full refresh) — without it, a flag whose whole purpose is
        recomputation would silently no-op on a resumed job id."""
        if name in self._done and not force:
            return False
        t0 = time.time()
        out = fn()
        if out is not None:
            record_lineage(out, self.job_id, name, self.metrics_path)
        else:
            # record a zero-row marker so the step is still resumable
            marker = self.spark.createDataFrame(
                [(self.job_id, name, -1, 0)],
                "job_id string, step string, partition_id int, rows long"
            ).withColumn("wall_ts", F.current_timestamp())
            marker.select(*METRICS_COLS).write.mode("append").parquet(
                self.metrics_path)
        self._done.add(name)
        return True

    def summary(self) -> str:
        return json.dumps({"job_id": self.job_id,
                           "completed": sorted(self._done)})
