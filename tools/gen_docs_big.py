#!/usr/bin/env python3
"""Deterministically scale the driver documents table for stress runs.

No external data: replica 0 of each sf0.1 document is verbatim; replica
j > 0 appends a per-doc variant suffix, so each original spawns a
family of near-duplicates (mostly-shared 3-gram shingles -> MinHash
collisions) that stresses the LSH pair miner and the
connected-components clustering at 10x the driver scale.  Every byte is
a pure function of (source table, replicas, doc_id), so two invocations
— at ANY partitioning (--partitions) — produce identical logical
content; resharding must not change the packed-corpus checksums.

Usage: python tools/gen_docs_big.py --out /tmp/docs_sf1 \
           [--replicas 10] [--partitions 32]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src",
                    default="/root/testdata/sf0.1/documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from nrt_spark.session import get_spark

    spark = get_spark(cores=8, app_name="gen_docs_big")
    docs = spark.read.parquet(args.src)
    # id namespace: replica j shifts by j * 10^7; VALIDATE the source
    # fits under the shift (a doc_id >= 10^7 would collide with a
    # replica id, silently corrupting dedup decisions downstream)
    max_id = docs.agg(F.max("doc_id")).first()[0]
    if max_id is None or max_id >= 10_000_000:
        raise ValueError(
            f"source doc_id range [0, {max_id}] does not fit under the "
            "10^7 replica shift; raise the shift for this table")
    rep = spark.range(args.replicas).select(
        F.col("id").cast("long").alias("rep"))
    out = (docs.crossJoin(F.broadcast(rep))
           .select(
               (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)
                .cast("long")).alias("doc_id"),
               # ONE doc-unique suffix token: enough shingle churn to
               # be a near-dup (not exact dup) of the original, but no
               # shared n-gram across docs that would cross-contaminate
               # the decontamination stage
               F.when(F.col("rep") == 0, F.col("text"))
               .otherwise(F.concat(
                   "text", F.lit(" v"), F.col("rep").cast("string"),
                   F.lit("d"), F.col("doc_id").cast("string")))
               .alias("text"),
               "lang", "source")
           .withColumn("n_chars", F.length("text")))
    out.repartition(args.partitions).write.mode("overwrite") \
        .parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"{args.out}: {n} docs, {args.partitions} partitions")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
