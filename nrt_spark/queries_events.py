"""Time-series queries on events: rollups, gap-fill, sequential statistics.

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
                                    _cents_col, _null, _t, json_int_field,
                                    q, sub, REGISTRY, SUB_SQL)

# =========================================================================
# Time-series on events: rollups, gap-fill, sequential statistics
# =========================================================================


@sub("events_rollup_day", f"""
SELECT user_id, date_trunc('day', ts)::DATE AS day,
       count(value) AS n,
       CAST(sum({_CENTS_SQL}) AS BIGINT) / 100.0 AS vsum,
       round(CAST(sum({_CENTS_SQL}) AS BIGINT)
             / (100.0 * count(value)), 6) AS mean,
       round(min(value), 4) AS vmin, round(max(value), 4) AS vmax,
       round(max_by(value, ts), 4) AS last
FROM events GROUP BY user_id, date_trunc('day', ts)::DATE
""")
def events_rollup_day(spark, sf_dir):
    """Tumbling-window continuous aggregate (tier=day) on the event
    stream — partial+final hash agg, one shuffle.  vsum/mean via exact
    integer cents (see _CENTS_SQL): identical doubles on both engines
    at any partitioning."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("value").alias("n"),
             (F.sum(_cents_col()) / 100.0).alias("vsum"),
             F.round(F.sum(_cents_col())
                     / (F.count("value") * 100.0), 6).alias("mean"),
             F.round(F.min("value"), 4).alias("vmin"),
             F.round(F.max("value"), 4).alias("vmax"),
             F.round(F.max_by("value", "ts"), 4).alias("last"))
    )


@sub("events_rollup_week", f"""
SELECT user_id, date_trunc('week', ts)::DATE AS week,
       count(value) AS n,
       round(CAST(sum({_CENTS_SQL}) AS BIGINT)
             / (100.0 * count(value)), 6) AS mean,
       round(min(value), 4) AS vmin, round(max(value), 4) AS vmax
FROM events GROUP BY user_id, date_trunc('week', ts)::DATE
""")
def events_rollup_week(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id",
                   F.date_trunc("week", "ts").cast("date").alias("week"))
        .agg(F.count("value").alias("n"),
             F.round(F.sum(_cents_col())
                     / (F.count("value") * 100.0), 6).alias("mean"),
             F.round(F.min("value"), 4).alias("vmin"),
             F.round(F.max("value"), 4).alias("vmax"))
    )


@q("bitmask_filter_events", """
SELECT event_type, count(*) AS n_clear,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
         AS k_sum
FROM events
WHERE (CAST(json_extract_string(props, '$.k') AS INT) & 3) = 0
GROUP BY event_type
""")
def bitmask_filter_events(spark, sf_dir):
    """Bitmask predicate filter (reference S2: the qa_pixel cloud-bit
    screen ``qa.bitwiseAND(0x1F) == 0``, dontplot_bolivia_stac.py:189) —
    plain Catalyst bitwise AND, pushed as a filter."""
    ev = _t(spark, sf_dir, "events")
    k = json_int_field("props", "k")
    return (ev.filter(k.bitwiseAND(F.lit(3)) == 0)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_clear"),
                 F.sum(k).alias("k_sum")))


@sub("events_interarrival", """
WITH gaps AS (
  SELECT user_id,
         epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) AS gap_s
  FROM events
)
SELECT user_id, count(gap_s) AS n_gaps,
       round(avg(gap_s), 2) AS mean_gap_s,
       round(max(gap_s), 2) AS max_gap_s
FROM gaps GROUP BY user_id
""")
def events_interarrival(spark, sf_dir):
    """Inter-arrival statistics via lag() — the W7 ordered-ingest
    diagnostic (revisit-cadence monitoring).

    The gap mirrors DuckDB's ``epoch(interval)`` float evaluation
    EXACTLY: a timestamp difference is a (days, micros) interval and
    epoch computes ``days*86400.0 + micros/1e6`` — two float steps.
    For sub-day gaps (days = 0) this is bit-identical to the single
    ``total_micros/1e6`` division; for multi-day gaps the two differ
    by 1 ulp, which crossed a round(,2) boundary on the round-8 sf1
    dry pass (user 2841: 136989.295 exact; two-part double
    ...94999999998 -> .29, single-division double .295 -> .30).
    Inherited divergence, present in the round-start code on the same
    data — fixed by folding in DuckDB's evaluation order."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    day_us = 86_400_000_000
    # exact integer day count (pmod/long arithmetic, no float floor):
    # the numerator is an exact multiple of day_us, so the division is
    # exact in double for any gap below 2^53 us
    sub_day = F.pmod(gap_us, F.lit(day_us))
    gap_s = (((gap_us - sub_day) / F.lit(day_us)) * 86400.0
             + sub_day / 1e6)
    gaps = ev.withColumn("gap_s", gap_s)
    return (gaps.groupBy("user_id")
            .agg(F.count("gap_s").alias("n_gaps"),
                 F.round(F.avg("gap_s"), 2).alias("mean_gap_s"),
                 F.round(F.max("gap_s"), 2).alias("max_gap_s")))


@q("dedup_edit_distance", """
WITH p AS (
  SELECT doc_id, lang, substr(text, 1, 30) AS prefix, n_chars % 5 AS b
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.prefix, b.prefix) AS dist
FROM p a JOIN p b ON a.lang = b.lang AND a.b = b.b AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 20
""")
def dedup_edit_distance(spark, sf_dir):
    """Edit-distance near-dup pairs on document prefixes, blocked by
    (lang, length-band) to bound the pair count (classic DP levenshtein
    computes identically in any engine).  Threshold 20 on 30-char
    prefixes keeps the result non-empty at every test sf (<=12 passed
    degenerately with 0 rows).

    Duplicate collapse (same guard the LSH miner grew after the sf1
    dry pass): docs sharing an identical (lang, band, prefix) key
    would recompute the same levenshtein k^2 times and quadratically
    inflate the block join under duplicate-heavy data — group them
    first, run the DP once per distinct-prefix pair, and expand the
    surviving pairs back through the groups (intra-group pairs have
    distance 0 by definition).  Output pair set identical; the oracle
    SQL still computes over the full table."""
    p = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.substring("text", 1, 30).alias("prefix"),
        (F.col("n_chars") % 5).alias("b"))
    # NULL keys never matched in the join form (NULL = NULL is not
    # true in SQL, and levenshtein(NULL, x) <= 20 is NULL-false), but
    # groupBy treats NULLs as equal — drop them up front so the
    # collapsed pair set stays identical to the oracle's
    p = p.filter(F.col("lang").isNotNull() & F.col("b").isNotNull()
                 & F.col("prefix").isNotNull())
    groups = (p.groupBy("lang", "b", "prefix")
              .agg(F.min("doc_id").alias("rep"),
                   F.collect_list("doc_id").alias("members"),
                   F.count("*").alias("m")))
    ga = groups.select(F.col("rep").alias("ra"), F.col("lang").alias("la"),
                       F.col("b").alias("ba"), F.col("prefix").alias("pa"),
                       F.col("members").alias("ma"))
    gb = groups.select(F.col("rep").alias("rb"), F.col("lang").alias("lb"),
                       F.col("b").alias("bb"), F.col("prefix").alias("pb"),
                       F.col("members").alias("mb"))
    cross = (ga.join(gb, (F.col("la") == F.col("lb"))
                     & (F.col("ba") == F.col("bb"))
                     & (F.col("ra") < F.col("rb")))
             .withColumn("dist", F.levenshtein("pa", "pb"))
             .filter(F.col("dist") <= 20)
             .select("dist", F.explode("ma").alias("x"), "mb")
             .select("dist", "x", F.explode("mb").alias("y"))
             .select(F.least("x", "y").alias("doc_a"),
                     F.greatest("x", "y").alias("doc_b"), "dist"))
    intra = (groups.filter(F.col("m") >= 2)
             .select(F.explode("members").alias("x"), "members")
             .select("x", F.explode("members").alias("y"))
             .filter(F.col("x") < F.col("y"))
             .select(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"),
                     F.lit(0).cast("int").alias("dist")))
    return cross.unionAll(intra)


@sub("events_rollup_month", f"""
SELECT user_id, date_trunc('month', ts)::DATE AS month,
       count(value) AS n,
       round(CAST(sum({_CENTS_SQL}) AS BIGINT)
             / (100.0 * count(value)), 6) AS mean,
       round(max_by(value, ts), 4) AS last
FROM events GROUP BY user_id, date_trunc('month', ts)::DATE
""")
def events_rollup_month(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id",
                   F.date_trunc("month", "ts").cast("date").alias("month"))
        .agg(F.count("value").alias("n"),
             F.round(F.sum(_cents_col())
                     / (F.count("value") * 100.0), 6).alias("mean"),
             F.round(F.max_by("value", "ts"), 4).alias("last"))
    )


@q("events_gapfill_day", f"""
WITH day AS (
  SELECT user_id, date_trunc('day', ts)::DATE AS day,
         count(value) AS n,
         CAST(sum({_CENTS_SQL}) AS BIGINT)
           / (100.0 * count(value)) AS mean
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM day GROUP BY 1
), scaffold AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM spans
), win AS (
  SELECT s.user_id, s.day, d.n, d.mean,
         last_value(d.mean IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN d.mean IS NOT NULL THEN s.day END
                    IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         first_value(d.mean IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN d.mean IS NOT NULL THEN s.day END
                     IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM scaffold s LEFT JOIN day d USING (user_id, day)
)
SELECT user_id, day, coalesce(n, 0) AS n, (n IS NULL) AS gap_filled,
       round(pv, 6) AS mean_ff,
       round(CASE WHEN mean IS NOT NULL THEN mean
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
                                         / CAST(nd - pd AS DOUBLE)) END,
             6) AS mean_lin
FROM win
""")
def events_gapfill_day(spark, sf_dir):
    """Dense daily scaffold per user + LOCF forward-fill AND linear
    interpolation between the neighbouring observed days (round 4) —
    the two gap-fill semantics every timeseries store ships, certified
    side by side (sequence + ordered windows, no extra shuffle)."""
    ev = _t(spark, sf_dir, "events")
    day = (ev.groupBy("user_id",
                      F.date_trunc("day", "ts").cast("date").alias("day"))
           .agg(F.count("value").alias("n"),
                # exact cents: identical day means on both engines at
                # any partitioning, so ffill/interp stay identical too
                (F.sum(_cents_col())
                 / (F.count("value") * 100.0)).alias("mean")))
    spans = day.groupBy("user_id").agg(F.min("day").alias("d0"),
                                       F.max("day").alias("d1"))
    scaffold = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    joined = scaffold.join(day, ["user_id", "day"], "left")
    wb = (W.partitionBy("user_id").orderBy("day")
          .rowsBetween(W.unboundedPreceding, 0))
    wf = (W.partitionBy("user_id").orderBy("day")
          .rowsBetween(0, W.unboundedFollowing))
    obs_day = F.when(F.col("mean").isNotNull(), F.col("day"))
    pv = F.last("mean", ignorenulls=True).over(wb)
    pd_ = F.last(obs_day, ignorenulls=True).over(wb)
    nv = F.first("mean", ignorenulls=True).over(wf)
    nd = F.first(obs_day, ignorenulls=True).over(wf)
    lin = F.when(F.col("mean").isNotNull(), F.col("mean")) \
        .when(pv.isNull(), nv).when(nv.isNull(), pv) \
        .otherwise(pv + (nv - pv)
                   * (F.datediff("day", pd_).cast("double")
                      / F.datediff(nd, pd_).cast("double")))
    return joined.select(
        "user_id", "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.col("n").isNull().alias("gap_filled"),
        F.round(pv, 6).alias("mean_ff"),
        F.round(lin, 6).alias("mean_lin"))


@sub("events_ewma", """
WITH ordered AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM events
)
SELECT user_id,
       round(sum(value * 0.3 * power(0.7, cnt - rn)), 6) AS ewma
FROM ordered GROUP BY user_id
""")
def events_ewma(spark, sf_dir):
    """EWMA (lambda=0.3, zero-init) closed form: the order-dependent fold
    becomes a power-weighted sum — expressible as window + agg."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wc = W.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(wc))
        .groupBy("user_id")
        .agg(F.round(F.sum(F.col("value") * 0.3
                           * F.pow(F.lit(0.7), F.col("cnt") - F.col("rn"))),
                     6).alias("ewma"))
    )


@sub("events_cusum", f"""
WITH hist AS (
  SELECT user_id,
         CAST(sum({_CENTS_SQL}) AS BIGINT) AS sc,
         CAST(sum({_CENTS_SQL} * {_CENTS_SQL}) AS BIGINT) AS ssq,
         count(*) AS histsize
  FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY user_id
), histstats AS (
  SELECT user_id, histsize,
         sc / (100.0 * histsize) AS mu,
         sqrt((ssq / 10000.0 - (sc / 100.0) * (sc / (100.0 * histsize)))
              / nullif(histsize - 1, 0)) AS sigma
  FROM hist
), mon AS (
  SELECT user_id, value FROM events WHERE ts >= TIMESTAMP '2024-01-16'
)
SELECT m.user_id,
       round(sum((m.value - h.mu) / (h.sigma * sqrt(h.histsize))), 6)
         AS process,
       max(h.histsize) AS histsize
FROM mon m JOIN histstats h ON m.user_id = h.user_id
GROUP BY m.user_id
""")
def events_cusum(spark, sf_dir):
    """CUSUM final process value: history stats (first 15 days) normalize
    the monitoring-period residual sum (cusum.py:116-131 semantics,
    history mean as the one-parameter model).  mu/sigma come from exact
    integer-cent moments (sum, sum of squares), so the normalizers are
    identical doubles on both engines at any partitioning — a 1-ulp
    drift in them shifts EVERY residual and lands round-6 boundaries at
    scale.  The residual sum itself stays float (values ~O(10), a few
    hundred terms: below round-6 visibility)."""
    ev = _t(spark, sf_dir, "events")
    c = _cents_col()
    hist = (ev.filter(F.col("ts") < "2024-01-16").groupBy("user_id")
            .agg(F.sum(c).alias("sc"),
                 F.sum(c * c).alias("ssq"),
                 F.count("*").alias("histsize")))
    # nullif guard: a single-event history makes (histsize - 1) zero —
    # Spark (non-ANSI float div) yields NULL but DuckDB IEEE yields
    # Inf/NaN, a latent cross-engine divergence; nullif restores the
    # old stddev_samp behavior (NULL sigma on BOTH engines at n=1)
    hist = hist.select(
        "user_id", "histsize",
        (F.col("sc") / (F.col("histsize") * 100.0)).alias("mu"),
        F.sqrt((F.col("ssq") / 10000.0
                - (F.col("sc") / 100.0)
                * (F.col("sc") / (F.col("histsize") * 100.0)))
               / F.nullif(F.col("histsize") - 1, F.lit(0))).alias("sigma"))
    mon = ev.filter(F.col("ts") >= "2024-01-16").select("user_id", "value")
    return (
        mon.join(hist, "user_id")
        .groupBy("user_id")
        .agg(F.round(F.sum((F.col("value") - F.col("mu"))
                           / (F.col("sigma") * F.sqrt(F.col("histsize")))),
                     6).alias("process"),
             F.max("histsize").alias("histsize"))
    )


@sub("events_moving_sum", f"""
WITH r AS (
  SELECT user_id, ts, event_id, value,
         sum({_CENTS_SQL}) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS win_cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rev
  FROM events
)
SELECT user_id, round(CAST(win_cents AS BIGINT) / 100.0, 6) AS mosum
FROM r WHERE rev = 1
""")
def events_moving_sum(spark, sf_dir):
    """MOSUM analog: final 5-observation moving sum per series, summed
    in exact cents (sliding float window sums are evaluated
    sequentially by Spark but segment-tree pairwise by DuckDB — a
    fold-order divergence waiting for a round boundary)."""
    ev = _t(spark, sf_dir, "events")
    w_sum = (W.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(-4, 0))
    w_rev = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("win_cents", F.sum(_cents_col()).over(w_sum))
        .withColumn("rev", F.row_number().over(w_rev))
        .filter("rev = 1")
        .select("user_id",
                F.round(F.col("win_cents") / 100.0, 6).alias("mosum"))
    )


@sub("events_counter_rate", """
WITH o AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS v,
         lag(CAST(round(value * 100) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS pv
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN pv IS NULL THEN 0
                     WHEN v >= pv THEN v - pv ELSE v END) AS BIGINT)
         AS increase_e2,
       CAST(count(CASE WHEN v < pv THEN 1 END) AS BIGINT) AS n_resets
FROM o GROUP BY user_id
""")
def events_counter_rate(spark, sf_dir):
    """PromQL-style ``increase()`` over a counter that RESETS: per
    consecutive pair, add ``cur - prev`` when monotone and ``cur``
    after a reset (the post-restart reading is wholly new increase) —
    the rate primitive every monitoring store needs for
    counter-semantic series.  Integer cent units (the ``revenue_e4``
    pattern) keep the cross-engine sum exact regardless of aggregation
    fold order.  One window pass + one groupBy, both keyed on the
    series id."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.round(F.col("value") * 100).cast("long")
    o = ev.select("user_id", "ts", "event_id", v.alias("v")) \
        .withColumn("pv", F.lag("v").over(w))
    inc = F.when(F.col("pv").isNull(), F.lit(0)) \
        .when(F.col("v") >= F.col("pv"), F.col("v") - F.col("pv")) \
        .otherwise(F.col("v"))
    return (o.groupBy("user_id")
            .agg(F.sum(inc).cast("long").alias("increase_e2"),
                 F.count(F.when(F.col("v") < F.col("pv"), F.lit(1)))
                 .cast("long").alias("n_resets")))


@sub("events_time_weighted", """
WITH o AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nt
  FROM events
)
SELECT user_id,
       round(CAST(sum(v * (nt - t)) AS DOUBLE)
             / CAST(max(t) - min(t) AS DOUBLE) / 100, 6) AS twa,
       CAST(max(t) - min(t) AS BIGINT) AS span_us
FROM o GROUP BY user_id
HAVING max(t) > min(t)
""")
def events_time_weighted(spark, sf_dir):
    """LOCF time-weighted average per series over the IRREGULAR event
    stream — the continuous-aggregate primitive for unevenly sampled
    data (a plain avg over-weights bursts).  Each observation holds
    until the next one: twa = sum(v_i * gap_i) / span.  The weighted
    sum is EXACT cross-engine: integer cents x integer microsecond
    gaps (both well inside int64), one double division at the end.
    One window pass + one groupBy sharing the series-id partitioning.
    """
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; the session runs UTC, so the cast is the
    # identity wall-clock and unix_micros agrees with DuckDB epoch_us
    o = ev.select("user_id", "ts", "event_id",
                  F.round(F.col("value") * 100).cast("long").alias("v"),
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("t")) \
        .withColumn("nt", F.lead("t").over(w))
    g = o.groupBy("user_id").agg(
        F.sum(F.col("v") * (F.col("nt") - F.col("t"))).alias("num"),
        (F.max("t") - F.min("t")).alias("span_us"))
    return (g.filter(F.col("span_us") > 0)
            .select("user_id",
                    F.round(F.col("num").cast("double")
                            / F.col("span_us").cast("double") / 100, 6)
                    .alias("twa"),
                    F.col("span_us").cast("long").alias("span_us")))


@sub("events_consec_outliers", """
WITH hist AS (
  SELECT user_id,
         quantile_cont(value, 0.25) AS q25, quantile_cont(value, 0.75) AS q75
  FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY user_id
), mon AS (
  SELECT e.user_id, e.value, h.q25, h.q75,
         row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
  FROM events e JOIN hist h ON e.user_id = h.user_id
  WHERE e.ts >= TIMESTAMP '2024-01-16'
), flagged AS (
  SELECT user_id, rn,
         (value > q75 + 1.5 * (q75 - q25) OR value < q25 - 1.5 * (q75 - q25))
           AS is_outlier
  FROM mon
)
SELECT user_id,
       max(rn) - coalesce(max(CASE WHEN NOT is_outlier THEN rn END), 0)
         AS trailing_outliers
FROM flagged GROUP BY user_id
""")
def events_consec_outliers(spark, sf_dir):
    """IQR-monitor analog: trailing consecutive-outlier run length per
    series (the reset-on-ok counter evaluated at end of stream)."""
    ev = _t(spark, sf_dir, "events")
    hist = (ev.filter(F.col("ts") < "2024-01-16").groupBy("user_id")
            .agg(F.expr("percentile(value, 0.25)").alias("q25"),
                 F.expr("percentile(value, 0.75)").alias("q75")))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    mon = (ev.filter(F.col("ts") >= "2024-01-16")
           .join(hist, "user_id")
           .withColumn("rn", F.row_number().over(w)))
    iqr = F.col("q75") - F.col("q25")
    flagged = mon.withColumn(
        "is_outlier",
        (F.col("value") > F.col("q75") + 1.5 * iqr)
        | (F.col("value") < F.col("q25") - 1.5 * iqr))
    return (
        flagged.groupBy("user_id")
        .agg((F.max("rn") - F.coalesce(
            F.max(F.when(~F.col("is_outlier"), F.col("rn"))), F.lit(0)))
            .alias("trailing_outliers"))
    )


@sub("events_max_error_run", """
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn_t
  FROM events
)
SELECT user_id, max(run_len) AS max_run FROM (
  SELECT user_id, rn - rn_t AS grp, count(*) AS run_len
  FROM seq WHERE event_type = 'error'
  GROUP BY user_id, rn - rn_t
) t GROUP BY user_id
""")
def events_max_error_run(spark, sf_dir):
    """Gaps-and-islands: longest consecutive run of 'error' events."""
    ev = _t(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = (ev.withColumn("rn", F.row_number().over(w_all))
           .withColumn("rn_t", F.row_number().over(w_typ)))
    runs = (seq.filter("event_type = 'error'")
            .groupBy("user_id", (F.col("rn") - F.col("rn_t")).alias("grp"))
            .agg(F.count("*").alias("run_len")))
    return runs.groupBy("user_id").agg(F.max("run_len").alias("max_run"))


