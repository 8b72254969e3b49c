#!/usr/bin/env python3
"""State-scale soak for the streaming stateful monitor.

The kill/restart soak (tests/test_streaming.py) proves exactly-once at
test scale; this tool proves the OTHER scale axis: the
``applyInPandasWithState`` monitor carrying 100k-1M series of state
across micro-batches.  It drives :func:`nrt_spark.streaming.
monitor_stream` over chunked file-source input, records the state-store
footprint and per-batch wall from the query progress log, then asserts
the fully drained report is byte-identical to the batch engine on the
same observations (reference semantics: nrt/monitor/__init__.py's
fit -> repeated monitor() loop).

Scale design notes (the reason this holds at 10^12 sequences on a real
cluster): state is ONE pickled blob per bucket — the state store keys
scale with ``num_buckets``, not with series, so RocksDB/HDFS state-store
metadata stays tiny while the per-bucket blob is a dense columnar frame
(`STATE_COLUMNS`) whose per-series cost is a few hundred bytes.  Buckets
are `pmod(xxhash64(doc_id), B)` — the same uniform hash partitioning the
batch engine uses, so skew cannot concentrate state.

Usage:
    python tools/monitor_state_soak.py --n-docs 1000000 --buckets 64 \
        --chunks 3 --cpus 8 [--workdir /tmp/nrt_monitor_soak]

Prints one JSON line with per-batch metrics and the equality verdict;
exits non-zero on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HISTORY_END = "2016-05-10"


def run_soak(spark, n_docs: int, num_buckets: int, n_chunks: int,
             workdir: Path, n_obs: int = 130, monitor: str = "cusum"
             ) -> dict:
    """Generate -> fit -> stream-monitor -> verify; returns metrics.

    Raises AssertionError if the drained streaming report is not
    byte-identical to the batch engine (mask, process, detection_date
    per doc_id).
    """
    from pyspark.sql import functions as F

    from nrt_spark.datagen import generate_tokens
    from nrt_spark.engine import NrtEngine
    from nrt_spark.kernels.monitors import resolve_params
    from nrt_spark.streaming import monitor_stream
    from nrt_spark.tokens import decode_long

    workdir = Path(workdir)
    if workdir.exists():
        shutil.rmtree(workdir)
    workdir.mkdir(parents=True)

    parts = max(8, num_buckets)
    t0 = time.perf_counter()
    generate_tokens(spark, n_docs, n_obs=n_obs, partitions=parts) \
        .write.parquet(str(workdir / "tokens"))
    toks = spark.read.parquet(str(workdir / "tokens"))
    t_gen = time.perf_counter() - t0

    eng = NrtEngine(spark, monitor, num_buckets=num_buckets,
                    trend=False, method="OLS")
    t0 = time.perf_counter()
    eng.save_state(eng.fit(toks, history_end=HISTORY_END),
                   str(workdir / "state0"))
    t_fit = time.perf_counter() - t0

    # monitor-period observations, chunked into day-range files so the
    # file source replays them as ordered micro-batches (repartition(1)
    # per chunk keeps upstream decode parallel, unlike coalesce)
    obs = (decode_long(toks)
           .withColumn("day", F.datediff("ts", F.lit("1970-01-01")))
           .filter(F.col("ts") > HISTORY_END)
           .select("doc_id", "day", "value"))
    days = sorted(r["day"] for r in obs.select("day").distinct().collect())
    cuts = [days[(i * len(days)) // n_chunks] for i in range(1, n_chunks)]
    bounds = [0] + cuts + [10 ** 9]
    src = workdir / "src"
    t0 = time.perf_counter()
    for i in range(n_chunks):
        (obs.filter((F.col("day") > bounds[i]) &
                    (F.col("day") <= bounds[i + 1]))
            .repartition(1).write.parquet(str(src / f"chunk{i}")))
    t_chunks = time.perf_counter() - t0
    n_obs_total = spark.read.parquet(str(src) + "/chunk*").count()

    params = resolve_params(monitor, trend=False, method="OLS")
    stream = (spark.readStream
              .schema("doc_id string, day int, value double")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src) + "/chunk*"))
    out = monitor_stream(stream, str(workdir / "state0"), params,
                         num_buckets=num_buckets)
    t0 = time.perf_counter()
    q = (out.writeStream.format("parquet")
         .option("path", str(workdir / "rows"))
         .option("checkpointLocation", str(workdir / "ck"))
         .trigger(availableNow=True).start())
    if not q.awaitTermination(3600):
        q.stop()
        raise RuntimeError("soak stream did not drain within 1h")
    t_stream = time.perf_counter() - t0

    batches = []
    for p in q.recentProgress:
        if not p or p.get("numInputRows", 0) == 0:
            continue
        so = (p.get("stateOperators") or [{}])[0]
        batches.append({
            "batch_id": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "trigger_ms": (p.get("durationMs") or {}).get(
                "triggerExecution"),
            "state_rows": so.get("numRowsTotal"),
            "state_mem_bytes": so.get("memoryUsedBytes"),
        })

    # equality vs the batch engine, computed engine-side (no 1M-row
    # pandas roundtrip): last emitted row per doc == batch monitor row
    got = (spark.read.parquet(str(workdir / "rows"))
           .groupBy("doc_id")
           .agg(F.max_by("mask", "last_day").alias("mask"),
                F.max_by("process", "last_day").alias("process"),
                F.max_by("detection_date", "last_day")
                .alias("detection_date")))
    want = eng.monitor(eng.load_state(str(workdir / "state0")), toks) \
              .select("doc_id", "mask", "process", "detection_date")
    joined = want.alias("w").join(got.alias("g"), "doc_id", "full_outer")
    agg = joined.agg(
        F.count("*").alias("n"),
        F.sum(F.when(
            F.expr("w.mask <=> g.mask") &
            F.expr("w.process <=> g.process") &
            F.expr("w.detection_date <=> g.detection_date"),
            0).otherwise(1)).alias("mismatches")).first()

    res = {
        "n_docs": n_docs,
        "num_buckets": num_buckets,
        "n_chunks": n_chunks,
        "monitor": monitor,
        "monitor_obs": n_obs_total,
        "gen_s": round(t_gen, 2),
        "fit_s": round(t_fit, 2),
        "chunk_write_s": round(t_chunks, 2),
        "stream_drain_s": round(t_stream, 2),
        "stream_obs_per_sec": round(n_obs_total / t_stream),
        "batches": batches,
        "max_state_mem_bytes": max(
            (b["state_mem_bytes"] or 0) for b in batches) if batches
            else None,
        "compared_docs": agg["n"],
        "mismatches": agg["mismatches"],
    }
    assert agg["n"] == n_docs, (
        f"row-count mismatch: compared {agg['n']} docs, expected {n_docs}")
    assert agg["mismatches"] == 0, (
        f"{agg['mismatches']} of {agg['n']} docs diverged from the "
        "batch engine")
    return res


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=250_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--monitor", default="cusum")
    ap.add_argument("--workdir", default="/tmp/nrt_monitor_soak")
    args = ap.parse_args(argv)

    from nrt_spark.session import get_spark

    spark = get_spark(cores=args.cpus, app_name="monitor_state_soak")
    try:
        res = run_soak(spark, args.n_docs, args.buckets, args.chunks,
                       Path(args.workdir), monitor=args.monitor)
    finally:
        spark.stop()
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
