"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline on sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2 (see
``nrt_spark/queries.py`` for the registry).  The sequential monitor
reports and the tier rollups carry GENERATED oracles (the
single-process numpy twin rendered as SQL literals, nrt_spark/oracle.py);
only inherently engine-specific operators — HLL sketches, LSH/IVF
internals, Gorilla stats, the streaming sink — remain rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nrt_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: day-tier continuous aggregate over the event stream
    joined with per-series EWMA and CUSUM process values + break flags —
    the engine's rollup + sequential-monitoring spine in one plan."""
    from pyspark.sql import functions as F

    day = Q.events_rollup_day(spark, SF0001)
    ewma = Q.events_ewma(spark, SF0001)
    cusum = Q.events_cusum(spark, SF0001)
    # No broadcast hints: the per-user aggregates grow one row per user
    # (SF-proportional), so a forced F.broadcast() would crash — not
    # degrade — once users outgrow the broadcast limit at 100x scale.
    # AQE auto-broadcasts them while they fit.
    return (
        day.join(ewma, "user_id")
        .join(cusum, "user_id")
        .withColumn("is_break", F.abs("process") > 3.0)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
