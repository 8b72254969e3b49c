"""Composite registry entries: schema-compatible sub-queries folded into one driver row each (the driver records at most 50 entries).

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

from nrt_spark.queries_relational import (  # noqa: F401
    anti_join_customers, distinct_parts_per_flag, json_extract_events,
    orders_above_cust_avg, pivot_status_qty, region_revenue,
    rollup_pricing, semi_join_orders, setops_suppliers,
    supplier_part_revenue, top_revenue_orders, topk_orders,
    window_rank_lineitems)
from nrt_spark.queries_events import (  # noqa: F401
    events_consec_outliers, events_counter_rate, events_cusum,
    events_ewma, events_interarrival, events_max_error_run,
    events_moving_sum, events_rollup_day, events_rollup_month,
    events_rollup_week, events_time_weighted)
from nrt_spark.queries_docs import (  # noqa: F401
    langid_docs, quality_histogram, split_sample_docs,
    token_counts_by_source, top_terms_by_source)
from nrt_spark.queries_nrt import bpe_token_counts  # noqa: F401

# =========================================================================
# Composite entries: fold schema-compatible sub-queries into one driver
# row each.  The driver's correctness harness records at most 50
# registry entries; composites keep EVERY operator's oracle inside that
# window (round-2 verdict #1) while the standalone functions above stay
# importable for tests, bench and __spark_entry__.  Each composite is a
# tagged UNION ALL with identical column names/types on both engines.
# =========================================================================



@q("semi_anti_joins", f"""
SELECT 'semi' AS part, o_orderstatus AS grp, n
FROM ({SUB_SQL['semi_join_orders']}) s
UNION ALL
SELECT 'anti' AS part, c_mktsegment AS grp, n
FROM ({SUB_SQL['anti_join_customers']}) a
""")
def semi_anti_joins(spark, sf_dir):
    """J4 semi + anti join surface in one driver row."""
    semi = semi_join_orders(spark, sf_dir)
    anti = anti_join_customers(spark, sf_dir)
    return (
        semi.select(F.lit("semi").alias("part"),
                    F.col("o_orderstatus").alias("grp"), "n")
        .unionAll(anti.select(F.lit("anti").alias("part"),
                              F.col("c_mktsegment").alias("grp"), "n"))
    )


@q("order_limit_setops", f"""
SELECT 'setops_' || op AS part, l_suppkey AS k1, {_NB} AS k2, {_ND} AS v
FROM ({SUB_SQL['setops_suppliers']}) s
UNION ALL
SELECT 'topk' AS part, o_orderkey AS k1, {_NB} AS k2, price AS v
FROM ({SUB_SQL['topk_orders']}) t
UNION ALL
SELECT 'rank' AS part, l_orderkey AS k1, CAST(l_linenumber AS BIGINT) AS k2,
       CAST(rn AS DOUBLE) AS v
FROM ({SUB_SQL['window_rank_lineitems']}) r
""")
def order_limit_setops(spark, sf_dir):
    """O10 set ops + total-order top-k + per-group window rank."""
    so = setops_suppliers(spark, sf_dir)
    tk = topk_orders(spark, sf_dir)
    rk = window_rank_lineitems(spark, sf_dir)
    return (
        so.select(F.concat(F.lit("setops_"), F.col("op")).alias("part"),
                  F.col("l_suppkey").alias("k1"),
                  _null("long").alias("k2"), _null("double").alias("v"))
        .unionAll(tk.select(F.lit("topk").alias("part"),
                            F.col("o_orderkey").alias("k1"),
                            _null("long").alias("k2"),
                            F.col("price").alias("v")))
        .unionAll(rk.select(F.lit("rank").alias("part"),
                            F.col("l_orderkey").alias("k1"),
                            F.col("l_linenumber").cast("long").alias("k2"),
                            F.col("rn").cast("double").alias("v")))
    )


@q("agg_variants", f"""
SELECT 'rollup' AS part, rf AS k1, ls AS k2, sum_qty AS v, n
FROM ({SUB_SQL['rollup_pricing']}) r
UNION ALL
SELECT 'distinct' AS part, l_returnflag AS k1, {_NS} AS k2,
       CAST(n_parts AS DOUBLE) AS v, n_supps AS n
FROM ({SUB_SQL['distinct_parts_per_flag']}) d
UNION ALL
SELECT 'pivot' AS part, l_returnflag AS k1, 'O' AS k2, qty_O AS v, n
FROM ({SUB_SQL['pivot_status_qty']}) p1
UNION ALL
SELECT 'pivot' AS part, l_returnflag AS k1, 'F' AS k2, qty_F AS v, n
FROM ({SUB_SQL['pivot_status_qty']}) p2
UNION ALL
SELECT 'approx_users_ok' AS part, event_type AS k1, {_NS} AS k2, 1.0 AS v,
       count(DISTINCT user_id) AS n
FROM events GROUP BY event_type
UNION ALL
SELECT 'approx_events_ok' AS part, event_type AS k1, {_NS} AS k2, 1.0 AS v,
       count(DISTINCT event_id) AS n
FROM events GROUP BY event_type
UNION ALL
SELECT 'approx_p50_ok' AS part, event_type AS k1, {_NS} AS k2, 1.0 AS v,
       count(*) AS n
FROM events GROUP BY event_type
""")
def agg_variants(spark, sf_dir):
    """A11 aggregation variants: ROLLUP grouping sets, exact distinct,
    pivot, and the HLL++ sketch certified WITHIN TOLERANCE against the
    exact count (rsd 0.02/0.01, asserted within 5 sigma — deterministic
    for a fixed input, so the cross-engine hash is stable; the raw
    sketch values themselves have no cross-engine oracle)."""
    ro = rollup_pricing(spark, sf_dir)
    di = distinct_parts_per_flag(spark, sf_dir)
    pv = pivot_status_qty(spark, sf_dir)
    ev = _t(spark, sf_dir, "events")
    # One aggregation per certified sketch, NOT one combined agg — and
    # NEVER an HLL sketch and an exact countDistinct of the same
    # high-cardinality column in one Aggregate.  Spark's two-phase
    # distinct rewrite keys the partial aggregate on
    # (group, distinct-value) and carries every non-distinct agg buffer
    # through it, i.e. one HyperLogLogPlusPlus register array (~10 KB
    # at rsd 0.01) PER DISTINCT VALUE: on the unique event_id column at
    # the sf10 probe (10M distinct) that is ~100 GB of sketch buffers
    # and the leg ran 298 s, vs ~6 s for each aggregate alone (the
    # user_id leg, 100k distinct, hides the same pathology at 5 s).
    # Splitting sketch and exact into separate aggs joined on the
    # 5-row group key keeps the HLL partial keyed on event_type alone;
    # the whole query dropped 415 s -> 23 s at sf10, identical output.
    apu = (ev.groupBy("event_type").agg(
               F.approx_count_distinct("user_id", 0.02).alias("au"))
           .join(ev.groupBy("event_type").agg(
               F.countDistinct("user_id").alias("eu")), "event_type"))
    ape = (ev.groupBy("event_type").agg(
               F.approx_count_distinct("event_id", 0.01).alias("ae"))
           .join(ev.groupBy("event_type").agg(
               F.countDistinct("event_id").alias("ee")), "event_type"))
    # GK percentile sketch certified by RANK bounds: with accuracy
    # 10000 the guaranteed rank error is 0.01%, so the sketch's p50
    # must land between the exact p45 and p55 values
    app = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50a"),
        F.expr("percentile(value, 0.45)").alias("p45"),
        F.expr("percentile(value, 0.55)").alias("p55"),
        F.count("*").alias("nrows"))

    def ok(approx, exact, tol):
        return (F.abs(F.col(approx) - F.col(exact))
                <= tol * F.col(exact)).cast("double")

    return (
        ro.select(F.lit("rollup").alias("part"), F.col("rf").alias("k1"),
                  F.col("ls").alias("k2"), F.col("sum_qty").alias("v"), "n")
        .unionAll(di.select(F.lit("distinct").alias("part"),
                            F.col("l_returnflag").alias("k1"),
                            _null("string").alias("k2"),
                            F.col("n_parts").cast("double").alias("v"),
                            F.col("n_supps").alias("n")))
        .unionAll(pv.select(F.lit("pivot").alias("part"),
                            F.col("l_returnflag").alias("k1"),
                            F.lit("O").alias("k2"),
                            F.col("qty_O").alias("v"), "n"))
        .unionAll(pv.select(F.lit("pivot").alias("part"),
                            F.col("l_returnflag").alias("k1"),
                            F.lit("F").alias("k2"),
                            F.col("qty_F").alias("v"), "n"))
        .unionAll(apu.select(F.lit("approx_users_ok").alias("part"),
                             F.col("event_type").alias("k1"),
                             _null("string").alias("k2"),
                             ok("au", "eu", 0.10).alias("v"),
                             F.col("eu").alias("n")))
        .unionAll(ape.select(F.lit("approx_events_ok").alias("part"),
                             F.col("event_type").alias("k1"),
                             _null("string").alias("k2"),
                             ok("ae", "ee", 0.05).alias("v"),
                             F.col("ee").alias("n")))
        .unionAll(app.select(F.lit("approx_p50_ok").alias("part"),
                             F.col("event_type").alias("k1"),
                             _null("string").alias("k2"),
                             ((F.col("p50a") >= F.col("p45"))
                              & (F.col("p50a") <= F.col("p55")))
                             .cast("double").alias("v"),
                             F.col("nrows").alias("n")))
    )


@q("star_subquery_suite", f"""
SELECT 'star' AS part, s_name AS k1, nation AS k2, p_brand AS k3,
       revenue_e4 AS v_e4, CAST(n_lines AS DOUBLE) AS v
FROM ({SUB_SQL['supplier_part_revenue']}) s
UNION ALL
SELECT 'corr_subq' AS part, CAST(o_orderkey AS VARCHAR) AS k1,
       {_NS} AS k2, {_NS} AS k3, {_NB} AS v_e4, price AS v
FROM ({SUB_SQL['orders_above_cust_avg']}) c
""")
def star_subquery_suite(spark, sf_dir):
    """Fact-to-dims star join + correlated scalar subquery."""
    st = supplier_part_revenue(spark, sf_dir)
    co = orders_above_cust_avg(spark, sf_dir)
    return (
        st.select(F.lit("star").alias("part"), F.col("s_name").alias("k1"),
                  F.col("nation").alias("k2"), F.col("p_brand").alias("k3"),
                  F.col("revenue_e4").alias("v_e4"),
                  F.col("n_lines").cast("double").alias("v"))
        .unionAll(co.select(F.lit("corr_subq").alias("part"),
                            F.col("o_orderkey").cast("string").alias("k1"),
                            _null("string").alias("k2"),
                            _null("string").alias("k3"),
                            _null("long").alias("v_e4"),
                            F.col("price").alias("v")))
    )


@q("events_rollup_tiers", f"""
SELECT 'day' AS tier, user_id, day AS bucket, n, vsum, mean, vmin, vmax, last
FROM ({SUB_SQL['events_rollup_day']}) d
UNION ALL
SELECT 'week' AS tier, user_id, week AS bucket, n, {_ND} AS vsum, mean,
       vmin, vmax, {_ND} AS last
FROM ({SUB_SQL['events_rollup_week']}) w
UNION ALL
SELECT 'month' AS tier, user_id, month AS bucket, n, {_ND} AS vsum, mean,
       {_ND} AS vmin, {_ND} AS vmax, last
FROM ({SUB_SQL['events_rollup_month']}) m
""")
def events_rollup_tiers(spark, sf_dir):
    """A10: all three continuous-aggregate tiers in one driver row
    (each tier is still one partial+final hash agg, one shuffle)."""
    d = events_rollup_day(spark, sf_dir)
    w = events_rollup_week(spark, sf_dir)
    m = events_rollup_month(spark, sf_dir)
    nd = _null("double")
    return (
        d.select(F.lit("day").alias("tier"), "user_id",
                 F.col("day").alias("bucket"), "n", "vsum", "mean",
                 "vmin", "vmax", "last")
        .unionAll(w.select(F.lit("week").alias("tier"), "user_id",
                           F.col("week").alias("bucket"), "n",
                           nd.alias("vsum"), "mean", "vmin", "vmax",
                           nd.alias("last")))
        .unionAll(m.select(F.lit("month").alias("tier"), "user_id",
                           F.col("month").alias("bucket"), "n",
                           nd.alias("vsum"), "mean", nd.alias("vmin"),
                           nd.alias("vmax"), "last"))
    )


@q("events_process_values", f"""
SELECT 'ewma' AS monitor, user_id, ewma AS process, {_NB} AS histsize
FROM ({SUB_SQL['events_ewma']}) e
UNION ALL
SELECT 'cusum' AS monitor, user_id, process, histsize
FROM ({SUB_SQL['events_cusum']}) c
UNION ALL
SELECT 'mosum' AS monitor, user_id, mosum AS process, {_NB} AS histsize
FROM ({SUB_SQL['events_moving_sum']}) m
UNION ALL
SELECT 'counter' AS monitor, user_id,
       CAST(increase_e2 AS DOUBLE) AS process, n_resets AS histsize
FROM ({SUB_SQL['events_counter_rate']}) r
UNION ALL
SELECT 'twa' AS monitor, user_id, twa AS process, span_us AS histsize
FROM ({SUB_SQL['events_time_weighted']}) t
""")
def events_process_values(spark, sf_dir):
    """A5-A7/W1-W3 SQL-expressible monitor primitives: final EWMA,
    CUSUM and MOSUM process values per series, plus the PromQL-style
    reset-aware counter increase and the LOCF time-weighted average
    (round 4)."""
    e = events_ewma(spark, sf_dir)
    c = events_cusum(spark, sf_dir)
    m = events_moving_sum(spark, sf_dir)
    r = events_counter_rate(spark, sf_dir)
    t = events_time_weighted(spark, sf_dir)
    nb = _null("long")
    return (
        e.select(F.lit("ewma").alias("monitor"), "user_id",
                 F.col("ewma").alias("process"), nb.alias("histsize"))
        .unionAll(c.select(F.lit("cusum").alias("monitor"), "user_id",
                           "process", "histsize"))
        .unionAll(m.select(F.lit("mosum").alias("monitor"), "user_id",
                           F.col("mosum").alias("process"),
                           nb.alias("histsize")))
        .unionAll(r.select(F.lit("counter").alias("monitor"), "user_id",
                           F.col("increase_e2").cast("double")
                           .alias("process"),
                           F.col("n_resets").alias("histsize")))
        .unionAll(t.select(F.lit("twa").alias("monitor"), "user_id",
                           F.col("twa").alias("process"),
                           F.col("span_us").alias("histsize")))
    )


@q("events_run_lengths", f"""
SELECT 'trailing_outlier' AS kind, user_id, trailing_outliers AS run_len
FROM ({SUB_SQL['events_consec_outliers']}) t
UNION ALL
SELECT 'max_error_run' AS kind, user_id, max_run AS run_len
FROM ({SUB_SQL['events_max_error_run']}) m
""")
def events_run_lengths(spark, sf_dir):
    """A8/W5 consecutive-run counters: trailing IQR-outlier run and
    longest error-event run per series."""
    t = events_consec_outliers(spark, sf_dir)
    m = events_max_error_run(spark, sf_dir)
    return (
        t.select(F.lit("trailing_outlier").alias("kind"), "user_id",
                 F.col("trailing_outliers").alias("run_len"))
        .unionAll(m.select(F.lit("max_error_run").alias("kind"), "user_id",
                           F.col("max_run").alias("run_len")))
    )


@q("events_scalar_stats", f"""
SELECT 'json_k' AS part, event_type AS grp, avg_k AS v1, {_ND} AS v2, n
FROM ({SUB_SQL['json_extract_events']}) j
UNION ALL
SELECT 'interarrival' AS part, CAST(user_id AS VARCHAR) AS grp,
       mean_gap_s AS v1, max_gap_s AS v2, n_gaps AS n
FROM ({SUB_SQL['events_interarrival']}) i
""")
def events_scalar_stats(spark, sf_dir):
    """O11 JSON scalar extraction + W7 inter-arrival diagnostics."""
    j = json_extract_events(spark, sf_dir)
    i = events_interarrival(spark, sf_dir)
    return (
        j.select(F.lit("json_k").alias("part"),
                 F.col("event_type").alias("grp"),
                 F.col("avg_k").alias("v1"), _null("double").alias("v2"),
                 "n")
        .unionAll(i.select(F.lit("interarrival").alias("part"),
                           F.col("user_id").cast("string").alias("grp"),
                           F.col("mean_gap_s").alias("v1"),
                           F.col("max_gap_s").alias("v2"),
                           F.col("n_gaps").alias("n")))
    )


@q("doc_lang_quality", f"""
SELECT 'langid' AS part, CAST(doc_id AS VARCHAR) AS k1, pred_lang AS k2,
       {_ND} AS v, CAST(1 AS BIGINT) AS n
FROM ({SUB_SQL['langid_docs']}) l
UNION ALL
SELECT 'quality' AS part, {_NS} AS k1, {_NS} AS k2, quality AS v,
       n_docs AS n
FROM ({SUB_SQL['quality_histogram']}) q
UNION ALL
SELECT 'bigram' AS part, CAST(doc_id AS VARCHAR) AS k1, {_NS} AS k2,
       CAST(freq_sum AS DOUBLE) AS v, n_bigrams AS n
FROM (
  WITH w AS (
    SELECT doc_id,
           list_filter(string_split(
             regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
             x -> len(x) > 0) AS w
    FROM documents
  ), bi AS (
    SELECT doc_id,
           unnest(CASE WHEN len(w) >= 2 THEN
             list_transform(range(len(w) - 1),
                            i -> w[i + 1] || ' ' || w[i + 2])
             ELSE [] END) AS bg
    FROM w
  ), counts AS (
    SELECT bg, count(*) AS c FROM bi GROUP BY bg
  )
  SELECT bi.doc_id, count(*) AS n_bigrams,
         CAST(sum(c) AS BIGINT) AS freq_sum
  FROM bi JOIN counts USING (bg) GROUP BY bi.doc_id
) bf
""")
def doc_lang_quality(spark, sf_dir):
    """Language-ID (per-doc prediction) + quality-score histogram +
    corpus-bigram-frequency stats (the cheap LM-frequency filter
    signal; integer-exact so the oracle digest is exact).

    Duplicate-adaptive: ONE sampled gate probe for the whole composite
    (every part is a pure function of the normalized text).  Collapsed,
    all three compute per DISTINCT text from a single _dup_groups
    relation — langid and the bigram stats expand back per doc through
    text equality, the quality histogram weights by multiplicity —
    identical output either way (pinned by the multiplicity test)."""
    docs = _t(spark, sf_dir, "documents")
    if D.duplicate_ratio_estimate(docs) < D.COLLAPSE_RATIO:
        groups = D._dup_groups(docs, members=False)
        reps = groups.select(F.col("rep").alias("doc_id"),
                             F.col("_t").alias("text"))
        # join-back shared with collapse_per_doc (null-safe text
        # equality: NULL-text docs must not vanish from the collapsed
        # branch — see dedup.expand_per_doc)
        l = D.expand_per_doc(docs, groups, TS.language_id(reps))
        h = (TS.quality_scores(reps).withColumnRenamed("doc_id", "rep")
             .join(groups.select("rep", "m"), "rep")
             .groupBy("quality").agg(F.sum("m").alias("n_docs")))
        bf = D.expand_per_doc(docs, groups, TS.bigram_freq_stats(
            reps, weights=groups.select(F.col("rep").alias("doc_id"), "m")))
    else:
        l = langid_docs(spark, sf_dir)
        h = quality_histogram(spark, sf_dir)
        bf = TS.bigram_freq_stats(docs)
    return (
        l.select(F.lit("langid").alias("part"),
                 F.col("doc_id").cast("string").alias("k1"),
                 F.col("pred_lang").alias("k2"), _null("double").alias("v"),
                 F.lit(1).cast("long").alias("n"))
        .unionAll(h.select(F.lit("quality").alias("part"),
                           _null("string").alias("k1"),
                           _null("string").alias("k2"),
                           F.col("quality").alias("v"),
                           F.col("n_docs").alias("n")))
        .unionAll(bf.select(F.lit("bigram").alias("part"),
                            F.col("doc_id").cast("string").alias("k1"),
                            _null("string").alias("k2"),
                            F.col("freq_sum").cast("double").alias("v"),
                            F.col("n_bigrams").alias("n")))
    )


@q("token_count_suite", f"""
SELECT 'whitespace' AS part, source, total_words AS v1,
       total_subwords AS v2, n_docs
FROM ({SUB_SQL['token_counts_by_source']}) w
UNION ALL
SELECT 'bpe' AS part, source, total_bpe_tokens AS v1, {_NB} AS v2, n_docs
FROM ({SUB_SQL['bpe_token_counts']}) b
""")
def token_count_suite(spark, sf_dir):
    """Whitespace + subword token counting and the GPT-2-style BPE
    pre-tokenizer regex, per source.  ONE gate probe for both parts
    (see dedup.duplicate_ratio_estimate)."""
    docs = _t(spark, sf_dir, "documents")
    collapse = D.duplicate_ratio_estimate(docs) < D.COLLAPSE_RATIO
    w = token_counts_by_source(spark, sf_dir, collapse=collapse)
    b = bpe_token_counts(spark, sf_dir, collapse=collapse)
    return (
        w.select(F.lit("whitespace").alias("part"), "source",
                 F.col("total_words").alias("v1"),
                 F.col("total_subwords").alias("v2"), "n_docs")
        .unionAll(b.select(F.lit("bpe").alias("part"), "source",
                           F.col("total_bpe_tokens").alias("v1"),
                           _null("long").alias("v2"), "n_docs"))
    )


@q("revenue_suite", f"""
SELECT 'topk' AS part, CAST(o_orderkey AS VARCHAR) AS k1,
       o_orderpriority AS k2, CAST(revenue_e4 AS DOUBLE) AS v, {_NB} AS n
FROM ({SUB_SQL['top_revenue_orders']}) t
UNION ALL
SELECT 'region' AS part, region AS k1, {_NS} AS k2, revenue AS v,
       n_orders AS n
FROM ({SUB_SQL['region_revenue']}) r
""")
def revenue_suite(spark, sf_dir):
    """Join+agg+deterministic-top-k and the broadcast star join in one
    driver row (round-4 consolidation; the standalone functions stay
    the bench's per-query timing targets)."""
    tk = top_revenue_orders(spark, sf_dir)
    rg = region_revenue(spark, sf_dir)
    return (
        tk.select(F.lit("topk").alias("part"),
                  F.col("o_orderkey").cast("string").alias("k1"),
                  F.col("o_orderpriority").alias("k2"),
                  F.col("revenue_e4").cast("double").alias("v"),
                  _null("long").alias("n"))
        .unionAll(rg.select(F.lit("region").alias("part"),
                            F.col("region").alias("k1"),
                            _null("string").alias("k2"),
                            F.col("revenue").alias("v"),
                            F.col("n_orders").alias("n")))
    )


@q("corpus_profile_suite", f"""
SELECT 'split' AS part, source AS k1, split AS k2, {_NS} AS term,
       n_docs AS n, id_checksum AS checksum
FROM ({SUB_SQL['split_sample_docs']}) s
UNION ALL
SELECT 'topterms' AS part, source AS k1, CAST(rk AS VARCHAR) AS k2,
       term, n, {_NB} AS checksum
FROM ({SUB_SQL['top_terms_by_source']}) t
""")
def corpus_profile_suite(spark, sf_dir):
    """Reshard-stable train/val split + per-source top-terms vocabulary
    profile in one driver row (round-4 consolidation)."""
    sp = split_sample_docs(spark, sf_dir)
    tt = top_terms_by_source(spark, sf_dir)
    return (
        sp.select(F.lit("split").alias("part"),
                  F.col("source").alias("k1"), F.col("split").alias("k2"),
                  _null("string").alias("term"),
                  F.col("n_docs").alias("n"),
                  F.col("id_checksum").cast("long").alias("checksum"))
        .unionAll(tt.select(F.lit("topterms").alias("part"),
                            F.col("source").alias("k1"),
                            F.col("rk").cast("string").alias("k2"),
                            F.col("term"), F.col("n").alias("n"),
                            _null("long").alias("checksum")))
    )


def _retention_sql() -> str:
    from nrt_spark.oracle import retention_oracle

    pdf = retention_oracle(n_docs=60, n_obs=60, keep_after="2015-06")
    rows = ",\n".join(
        f"('{p}', {int(b)}, {int(a)}, {int(fl)}, "
        f"{'TRUE' if d else 'FALSE'})"
        for p, b, a, fl, d in pdf.itertuples(index=False))
    return ("SELECT period, CAST(buckets_before AS BIGINT) AS "
            "buckets_before, CAST(buckets_after AS BIGINT) AS "
            "buckets_after, CAST(files_after AS BIGINT) AS files_after, "
            "dropped FROM (VALUES\n" + rows +
            "\n) t(period, buckets_before, buckets_after, files_after, "
            "dropped)")


@q("nrt_retention_certify", lambda: _retention_sql())
def nrt_retention_certify(spark, sf_dir):
    """Retention + compaction certification through the driver's gate:
    materialize the day tier partitioned by period, compact every
    period to its target file count, expire periods older than the
    cutoff (a partition DROP, no rewrite — the parquet stand-in for
    Iceberg expire_snapshots/DROP PARTITION), and report per-period
    bucket counts before/after, surviving file counts, and the drop
    decision.  The VALUES twin derives every number from the token
    grid (5-day cadence: buckets per period = docs x grid days in that
    month), so a mis-dropped partition, a compaction that loses rows,
    or an expiry off-by-one on the period boundary all hash-mismatch."""
    import tempfile
    from pathlib import Path

    from nrt_spark.datagen import generate_tokens
    from nrt_spark.rollup import (compact_tiers, expire_tier, rollup_raw,
                                  write_tier)
    from nrt_spark.tokens import decode_long

    import shutil

    # the tier is throwaway scaffolding: every number below is collected
    # into local rows before return, so the path can be removed in the
    # finally (no leaked /tmp day-tier per correctness/driver run)
    tmp = tempfile.mkdtemp(prefix="nrt_retention_")
    try:
        day = rollup_raw(decode_long(generate_tokens(spark, 60,
                                                     n_obs=60)), "day")
        write_tier(day, tmp, "day")
        compact_tiers(spark, tmp, target_mb=1024)   # -> 1 file/period
        before = {r["period"]: r["cnt"] for r in
                  spark.read.parquet(f"{tmp}/tier=day")
                  .groupBy("period").agg(F.count("*").alias("cnt"))
                  .collect()}
        dropped = {d.split("=", 1)[1]
                   for d in expire_tier(tmp, "day", keep_after="2015-06")}
        after = {r["period"]: r["cnt"] for r in
                 spark.read.parquet(f"{tmp}/tier=day")
                 .groupBy("period").agg(F.count("*").alias("cnt"))
                 .collect()}
        rows = []
        for p in sorted(before):
            files = len(list((Path(tmp) / "tier=day" / f"period={p}")
                             .glob("*.parquet"))) if p not in dropped else 0
            rows.append((p, before[p], after.get(p, 0), files,
                         p in dropped))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "period string, buckets_before long, buckets_after long, "
              "files_after long, dropped boolean")


def _lttb_sql() -> str:
    from nrt_spark.oracle import lttb_oracle

    pdf = lttb_oracle(n_docs=60, n_obs=60, n_out=12)
    rows = ",\n".join(
        f"('{d}', TIMESTAMP '{ts}', CAST('{float(v)!r}' AS DOUBLE))"
        for d, ts, v in pdf.itertuples(index=False))
    return ("SELECT doc_id, ts, value FROM (VALUES\n" + rows
            + "\n) t(doc_id, ts, value)")


@q("nrt_lttb_downsample", lambda: _lttb_sql())
def nrt_lttb_downsample(spark, sf_dir):
    """Shape-preserving LTTB downsample (Steinarsson 2013) of the
    decoded token series — the visualization-grade companion to the
    tier rollups: 12 points per series chosen to preserve the curve,
    gaps excluded like a renderer drops missing samples.  One shuffle
    on doc_id + a vectorized numpy kernel per series; the VALUES twin
    replays the identical selection single-process, so the certified
    surface is the distributed plumbing (grouping, in-group sort, gap
    exclusion, timestamp decode)."""
    from nrt_spark.datagen import generate_tokens
    from nrt_spark.rollup import lttb_downsample
    from nrt_spark.tokens import decode_long

    toks = generate_tokens(spark, 60, n_obs=60)
    return lttb_downsample(decode_long(toks), n_out=12)
