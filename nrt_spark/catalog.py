"""Table storage abstraction: Iceberg when a catalog is configured,
bucket/period-partitioned parquet otherwise.

The engine's design targets Iceberg (BASELINE north rule): state tables
bucket-partitioned by ``bucket(doc_id)`` so the obs<->state alignment is
a storage-partitioned join, tier tables partitioned by period so
retention is a metadata partition drop, and snapshots as checkpoints.
This container has no Iceberg runtime jar, so the default backend is
parquet with the *same physical layout*; every call site maps 1:1:

| engine op                    | parquet backend         | Iceberg backend |
|------------------------------|-------------------------|-----------------|
| save_state (checkpoint)      | write.partitionBy(bucket) | ``writeTo(t).partitionedBy(bucket(N, doc_id)).createOrReplace()`` |
| load_state (resume)          | read.parquet            | ``read.table`` (latest snapshot) / ``VERSION AS OF`` |
| write_tier                   | partitionBy(period)     | ``partitionedBy(months(bucket_start))`` |
| expire_tier (retention)      | partition dir removal   | ``ALTER TABLE ... DROP PARTITION`` + ``expire_snapshots`` |
| incremental monitor merge    | overwrite snapshot      | ``MERGE INTO state USING updates`` |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is configured and loadable."""
    try:
        impl = spark.conf.get("spark.sql.catalog.nrt", None)
    except Exception:
        impl = None
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, ident: str, partition_cols: tuple = (),
                mode: str = "overwrite") -> None:
    """Persist ``df`` as a managed table (Iceberg) or a parquet dir.

    ``ident``: an Iceberg identifier (``nrt.db.state``) when the catalog
    is active, else a filesystem path.
    """
    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(ident)
        if partition_cols:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_cols])
        writer.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(ident)


def read_table(spark: SparkSession, ident: str) -> DataFrame:
    if iceberg_available(spark):
        return spark.read.table(ident)
    return spark.read.parquet(ident)
