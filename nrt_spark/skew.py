"""Skew handling: salted two-phase aggregation.

The token table's ``source`` column is deliberately zipf-skewed (src0
holds ~50% of rows at the default generator settings).  A plain
``groupBy(source)`` sends every src0 row to one reducer; for algebraic
aggregates the classic fix is salting: aggregate on
``(source, salt)`` first (fan-out S), then merge the S partials.
AQE's skew handling covers *joins*; grouped aggregation over a hot key
with a non-algebraic payload (collect_list into a grouped UDF) needs
this explicit treatment — the same pattern bounds per-group matrix
sizes if doc_ids were ever hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, salts: int, key: str = "doc_id") -> DataFrame:
    """Deterministic salt in [0, salts): a hash of the row's unique key,
    NOT rand() — reproducible across retries/resume."""
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(key, F.lit("salt")), F.lit(salts)).cast("int"))


def salted_source_stats(tokens_df: DataFrame, salts: int = 16) -> DataFrame:
    """Per-source row/token statistics via salt + merge.

    Phase 1 shuffles on (source, salt) — the hot source fans out over
    ``salts`` reducers; phase 2 merges ``salts`` rows per source
    (algebraic: sums of sums, sum of counts).  Output matches the
    unsalted aggregation exactly (integer arithmetic).
    """
    phase1 = (
        with_salt(tokens_df, salts)
        .groupBy("source", "salt")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tok").alias("n_tokens"),
             F.sum(F.size(F.filter("tokens", lambda t: t == -1)))
             .alias("n_gaps"))
    )
    return (
        phase1.groupBy("source")
        .agg(F.sum("n_docs").alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"),
             F.sum("n_gaps").alias("n_gaps"))
    )


def plain_source_stats(tokens_df: DataFrame) -> DataFrame:
    """Unsalted reference aggregation (for equivalence tests)."""
    return (
        tokens_df.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tok").alias("n_tokens"),
             F.sum(F.size(F.filter("tokens", lambda t: t == -1)))
             .alias("n_gaps"))
    )
