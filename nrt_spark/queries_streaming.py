"""Streaming registry entries (registered LAST for crash isolation).

Part of the driver-contract query registry — split out of the single
registry module in round 6 (same conventions; see
nrt_spark/queries.py for the registry contract and
nrt_spark/queries_base.py for the shared helpers)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401
from pyspark.sql import Window as W  # noqa: F401

from nrt_spark.dataops import dedup as D  # noqa: F401
from nrt_spark.dataops import simsearch as SS  # noqa: F401
from nrt_spark.dataops import textstats as TS  # noqa: F401
from nrt_spark.dataops.textstats import LANG_MARKERS  # noqa: F401
from nrt_spark.queries_base import (_CENTS_SQL, _NB, _ND, _NS,  # noqa: F401
                                    _cents_col, _null, _t, q, sub,
                                    REGISTRY, SUB_SQL)

from nrt_spark.queries_nrt import (_day_tier_sql,  # noqa: F401
                                   _report_oracle_sql,
                                   _report_shape)

# the three streaming entries are registered LAST: if the streaming
# machinery ever hard-kills the harness process, every other registry
# entry has already been recorded.
@q("nrt_streaming_monitor_report",
   lambda: _report_oracle_sql("cusum", trend=False, method="OLS"))
def nrt_streaming_monitor_report(spark, sf_dir):
    """The STREAMING monitor through the driver's correctness gate: fit
    a batch state snapshot, feed the monitoring period as two file-source
    micro-batches through the stateful operator
    (applyInPandasWithState), and report the final per-series state —
    which must land byte-exactly on the same single-process numpy
    oracle as the batch report (checkpoint bootstrap, per-series
    watermark, micro-batch folding all certified)."""
    import shutil as _shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="nrt_stream_mon_")
    try:
        return _streaming_monitor_report_impl(spark, tmp)
    finally:
        # the memory sink holds the result rows; the source/checkpoint
        # scaffolding under /tmp is not needed after the query drains
        _shutil.rmtree(tmp, ignore_errors=True)


def _streaming_monitor_report_impl(spark, tmp):
    from nrt_spark.datagen import generate_tokens
    from nrt_spark.engine import NrtEngine
    from nrt_spark.kernels.monitors import resolve_params
    from nrt_spark.streaming import monitor_stream
    from nrt_spark.tokens import decode_long

    toks = generate_tokens(spark, 300, n_obs=130)
    eng = NrtEngine(spark, "cusum", num_buckets=16, trend=False,
                    method="OLS")
    eng.save_state(eng.fit(toks, history_end="2016-05-10"),
                   tmp + "/state")
    obs = (decode_long(toks).filter(F.col("ts") > "2016-05-10")
           .withColumn("day", F.datediff("ts", F.lit("1970-01-01")))
           .select("doc_id", "day", "value"))
    (obs.filter("day <= 17333").coalesce(1)
        .write.parquet(tmp + "/src/chunk0"))
    (obs.filter("day > 17333").coalesce(1)
        .write.parquet(tmp + "/src/chunk1"))
    # FileStreamSource orders files by modification time; on a
    # coarse-mtime filesystem a tie could deliver chunk1 first, making
    # every chunk0 row late behind the per-series watermark.  Force
    # strictly increasing mtimes so chunk0 is always micro-batch 0.
    import glob as _glob
    import os as _os
    for i, chunk in enumerate(("chunk0", "chunk1")):
        for f in _glob.glob(f"{tmp}/src/{chunk}/*.parquet"):
            _os.utime(f, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (spark.readStream
              .schema("doc_id string, day int, value double")
              .option("maxFilesPerTrigger", "1")
              .parquet(tmp + "/src/chunk*"))
    params = resolve_params("cusum", trend=False, method="OLS")
    query = (monitor_stream(stream, tmp + "/state", params,
                            num_buckets=16)
             .writeStream.format("memory")
             .queryName("nrt_streaming_monitor_sink")
             .option("checkpointLocation", tmp + "/ck")
             .trigger(availableNow=True).start())
    try:
        finished = query.awaitTermination(120)
    finally:
        query.stop()
    if not finished:
        raise TimeoutError("streaming monitor did not drain in 120s")
    final = spark.sql(
        "SELECT doc_id, max_by(mask, last_day) AS mask, "
        "max_by(detection_date, last_day) AS detection_date, "
        "max_by(process, last_day) AS process "
        "FROM nrt_streaming_monitor_sink GROUP BY doc_id")
    return _report_shape(final)


def _streaming_rollup_sql() -> str:
    """VALUES oracle from the numpy twin: at the 5-day cadence each day
    bucket is one observation, so the expected streaming output is
    fully determined (gap tokens -> n=0 buckets with NULL mean)."""
    from nrt_spark.oracle import streaming_rollup_oracle

    pdf = streaming_rollup_oracle(n_docs=30, n_obs=40)
    rows = ",\n".join(
        "('{}', TIMESTAMP '{}', {}, {})".format(
            d, ts, int(n),
            # pandas coerces the twin's None to NaN: render gap buckets
            # as SQL NULL, which is what Spark's null/0 mean produces
            "NULL" if (m is None or m != m)
            else f"CAST('{float(m)!r}' AS DOUBLE)")
        for d, ts, n, m in pdf.itertuples(index=False))
    return ("SELECT doc_id, bucket_start, CAST(n AS BIGINT) AS n, "
            "CAST(mean AS DOUBLE) AS mean FROM (VALUES\n" + rows
            + "\n) t(doc_id, bucket_start, n, mean)")


@q("nrt_streaming_rollup", lambda: _streaming_rollup_sql())
def nrt_streaming_rollup(spark, sf_dir):
    """Structured Streaming continuous aggregate: the day-tier rollup
    fed through a file-source stream with a watermark (availableNow),
    landing on the same buckets as the batch tier.  Deliberately tiny
    (30 docs x 40 obs) and explicitly stopped — the harness should spend
    milliseconds here, not a micro-batch timeout."""
    import tempfile

    from nrt_spark.datagen import generate_tokens
    from nrt_spark.tokens import decode_long
    from nrt_spark.streaming import rollup_stream

    import shutil as _shutil

    tmp = tempfile.mkdtemp(prefix="nrt_stream_q_")
    try:
        toks = generate_tokens(spark, 30, n_obs=40)
        (decode_long(toks).select("doc_id", "ts", "value")
         .coalesce(1).write.parquet(tmp + "/src"))
        stream = (spark.readStream
                  .schema("doc_id string, ts timestamp, value double")
                  .parquet(tmp + "/src"))
        name = "nrt_streaming_rollup_sink"
        query = (rollup_stream(stream, tier="day", watermark="10 days")
                 .writeStream.format("memory").queryName(name)
                 .outputMode("complete")
                 .option("checkpointLocation", tmp + "/ck")
                 .trigger(availableNow=True).start())
        try:
            finished = query.awaitTermination(120)
        finally:
            query.stop()
        if not finished:
            # partial buckets must fail loudly, not record as a clean run
            raise TimeoutError("streaming rollup did not drain in 120s")
        # the memory sink holds the rows; tmp is removed in the finally
        return spark.sql(
            f"SELECT doc_id, bucket_start, n, round(mean, 6) AS mean "
            f"FROM {name}")
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)


@q("nrt_streaming_tier_upsert", lambda: _day_tier_sql())
def nrt_streaming_tier_upsert(spark, sf_dir):
    """Streaming TABLE-STATE maintenance through the driver's gate: the
    token stream arrives as two out-of-order file chunks (the late
    chunk holds the EARLIER observations) and folds into the tier via
    foreachBatch + upsert_tier — no watermark, late data merges
    exactly.  The result must equal the batch day tier row-for-row, so
    it shares nrt_rollup_day_tier's VALUES oracle (at the 5-day cadence
    every bucket's points arrive within one chunk, so even float sums
    are byte-exact)."""
    import glob as _glob
    import os as _os
    import tempfile

    from nrt_spark.datagen import generate_tokens
    from nrt_spark.streaming import rollup_stream_upsert
    from nrt_spark.tokens import decode_long

    import shutil as _shutil

    tmp = tempfile.mkdtemp(prefix="nrt_stream_upsert_")
    try:
        obs = decode_long(generate_tokens(spark, 60, n_obs=60)) \
            .select("doc_id", "ts", "value")
        (obs.filter("ts >= '2015-06-01'").coalesce(1)
            .write.parquet(tmp + "/src/chunk0"))
        (obs.filter("ts < '2015-06-01'").coalesce(1)
            .write.parquet(tmp + "/src/chunk1"))
        for i, chunk in enumerate(("chunk0", "chunk1")):
            for f in _glob.glob(f"{tmp}/src/{chunk}/*.parquet"):
                _os.utime(f, (1_700_000_000 + i * 10,) * 2)
        stream = (spark.readStream
                  .schema("doc_id string, ts timestamp, value double")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(tmp + "/src/chunk*"))
        query = rollup_stream_upsert(stream, tmp + "/tiers", "day",
                                     checkpoint=tmp + "/ck")
        try:
            finished = query.awaitTermination(120)
        finally:
            query.stop()
        if not finished:
            raise TimeoutError(
                "streaming tier upsert did not drain in 120s")
        # the result READS the tier under tmp, so pin its rows into the
        # block manager (eager localCheckpoint) before the finally
        # removes the scaffolding — the few-thousand-row result is the
        # only thing that outlives this function
        return (spark.read.parquet(tmp + "/tiers/tier=day")
                .select("doc_id", "bucket_start", "n",
                        F.round("mean", 6).alias("mean"),
                        F.round("vmin", 6).alias("vmin"),
                        F.round("vmax", 6).alias("vmax"))
                .localCheckpoint())
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)

