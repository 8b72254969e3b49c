"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cores: int | str = "*", app_name: str = "nrt_spark",
              shuffle_partitions: int | None = None,
              driver_memory: str = "48g", extra_conf: dict | None = None
              ) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    Args:
        cores: N for ``local[N]`` or ``"*"``.
        shuffle_partitions: defaults to 2x cores (or 32 for ``*``) — sized
            for local mode, not the 200 cluster default.
        driver_memory: local mode runs everything in the driver JVM.
        extra_conf: additional ``spark.*`` settings.
    """
    # Keep BLAS single-threaded inside tasks: Spark tasks are the
    # parallelism axis (same rationale as the reference's numba guidance,
    # docs/gallery/plot_parallel_computing.py:19-34).
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("MKL_NUM_THREADS", "1")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores == "*" else max(8, 2 * int(cores))
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Start every exchange wide and let AQE coalesce DOWN by its
        # 64MB advisory size: with only 2x-cores shuffle partitions, a
        # growing input eventually spills every partition (sf100 probe:
        # 750M exploded shingle rows / 16 partitions = 47M rows each —
        # simhash read 12.6x the sf10 wall).  Small queries are
        # unaffected (AQE coalesces them back to a handful of tasks);
        # big shuffles keep enough partitions to stay in memory.  This
        # is the cluster-correct shape: high initial, AQE right-sizes.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(max(64, 8 * (32 if cores == "*" else int(cores)))))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Prefer ShuffledHashJoin over SortMergeJoin where Spark's own
        # selection guards allow it (build side must be ~3x smaller
        # than the stream side AND estimated under
        # autoBroadcastJoinThreshold x shuffle partitions, so the
        # per-partition hash map is bounded; AQE skew-join still
        # splits outliers).  Sorting both sides of a big fact-dim join
        # is pure overhead when the dim hashes: sf100 A/B (fresh JVMs,
        # two separate host windows): star_subquery_suite's 600M x 8M
        # lineitem-part join 165.9 -> 110.3 s and 188.8 -> 142.7 s
        # (~25-30% both windows); same-magnitude joins without an
        # eligible build side (semi_anti, revenue) are neutral within
        # window noise.  SMJ remains the fallback whenever the guards
        # don't hold (huge-build joins keep graceful sort-spill
        # behavior); identical results either way, re-certified by the
        # full oracle suite under this config.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
