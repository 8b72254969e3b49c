#!/usr/bin/env python3
"""Training-corpus export job: spark-submit --py-files nrt_spark.zip
jobs/corpus_job.py --input <documents parquet> --output <root>

documents -> exact dedup -> near-dup dedup (MinHash/LSH + connected
components) -> decontamination vs the held-out split -> quality filter
-> tokenize -> fixed-length packed shards, with per-stage lineage so a
crashed run resumes at the completed stage (same --job-id skips done
steps).  Prints one JSON summary line: the per-stage doc funnel plus
pack/shard/token totals.

Every stage decision is hash-derived and deterministic, so re-runs and
reshards reproduce the same corpus bit-for-bit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents parquet "
                    "(doc_id, text, source); default: driver testdata")
    ap.add_argument("--output", default="/tmp/nrt_corpus")
    ap.add_argument("--job-id", default="corpus0")
    ap.add_argument("--min-quality", type=float, default=0.7)
    ap.add_argument("--max-df", type=int, default=50)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--cc-telemetry", action="store_true",
                    help="record connected-components per-round "
                         "convergence (nodes/edges/changed counts) in "
                         "the summary — one extra count per CC round")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("nrt_corpus_job")
             .config("spark.driver.memory",
                     os.environ.get("NRT_JOB_DRIVER_MEM", "8g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from nrt_spark.dataops import corpus as C
    from nrt_spark.lineage import ResumableJob
    from nrt_spark.tokens import pack_sequences

    inp = args.input or "/root/testdata/sf0.01/documents.parquet"
    out = args.output
    t0 = time.time()
    docs = spark.read.parquet(inp)
    n_in = docs.count()
    job = ResumableJob(spark, args.job_id, f"{out}/metrics")

    # the funnel is defined ONCE in corpus.stage_plan; the job just
    # materializes each stage to parquet so resume can skip it
    cur = docs
    funnel = {"input": n_in}
    cc_stats: dict | None = {} if args.cc_telemetry else None
    for name, fn in C.stage_plan(min_quality=args.min_quality,
                                 max_df=args.max_df,
                                 cc_telemetry=cc_stats):
        prev = cur

        def run(fn=fn, prev=prev, name=name):
            fn(prev).write.mode("overwrite").parquet(f"{out}/{name}")
            return None

        job.step(name, run)
        cur = spark.read.parquet(f"{out}/{name}")
        funnel[name] = cur.count()
    good = cur

    def write_packed():
        (pack_sequences(C.tokenize(good), seq_len=args.seq_len,
                        num_shards=args.num_shards)
         .repartition(args.num_shards, "shard")
         .write.mode("overwrite").partitionBy("shard")
         .parquet(f"{out}/shards"))
        return None

    job.step("pack_shards", write_packed)

    shards = spark.read.parquet(f"{out}/shards")
    stats = shards.agg(
        F.count("*").alias("packs"),
        F.countDistinct("shard").alias("shards"),
        F.sum("n_real").cast("long").alias("real_tokens")).collect()[0]
    if cc_stats is not None and not cc_stats:
        # the neardup stage was skipped by resume, so CC never ran —
        # say so instead of silently omitting the requested telemetry
        cc_stats = {"skipped": "neardup_dedup stage resumed from a "
                               "previous run; use a fresh --job-id to "
                               "record CC telemetry"}
    print(json.dumps({
        "job_id": args.job_id,
        "funnel": funnel,
        **({"cc": cc_stats} if cc_stats else {}),
        "packs": int(stats["packs"]),
        "shards": int(stats["shards"]),
        "real_tokens": int(stats["real_tokens"]),
        "seq_len": args.seq_len,
        "wall_sec": round(time.time() - t0, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
