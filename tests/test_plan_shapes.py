"""Physical-plan regression tests: the scale properties that matter at
100 TB are plan SHAPES (pushdown, pruning, broadcast, no cross joins,
no needless Exchange).  These tests pin them so a refactor that quietly
degrades a plan fails CI, not a cluster bill."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from nrt_spark import queries as Q

SF_DIR = os.environ.get("NRT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not Path(SF_DIR).exists(),
                                reason="driver testdata not present")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = plan_of(Q.queries()["pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
        in plan, "shipdate filter must reach the parquet scan"
    # column pruning: the wide comment column must not be read
    assert "l_comment" not in plan


def executed_plan_of(df) -> str:
    """Final (post-AQE) physical plan: run the query, then read the plan.
    Needed wherever the property under test is an ADAPTIVE decision —
    e.g. a broadcast that must arise WITHOUT a hint.  The adaptive plan
    string repeats the tree under '== Initial Plan =='; keep only the
    final section so node counts aren't doubled."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_star_joins_broadcast(spark):
    """The SF-proportional dims (customer, supplier, part) carry NO
    F.broadcast() hint — a forced hint CRASHES (broadcast/driver OOM)
    instead of degrading once the dim outgrows memory at a 100x
    scale-up.  This pins that at driver scale AQE still broadcasts all
    three joins hint-free, so dropping the hints cost nothing here while
    restoring Spark's safety valve at scale."""
    for name in ("region_revenue", "supplier_part_revenue"):
        fn = Q.queries().get(name) or getattr(Q, name)
        plan = executed_plan_of(fn(spark, SF_DIR))
        assert plan.count("BroadcastHashJoin") == 3, name
        assert "SortMergeJoin" not in plan, name


def test_asof_join_has_no_join(spark):
    """The union+window as-of rewrite: ONE window pass, zero joins —
    the property that makes it linear on a hot user."""
    plan = plan_of(Q.queries()["asof_join_clicks"](spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" in plan


def test_neardup_plans_have_no_cross_join(spark):
    for name in ("embedding_neardup_lsh", "dedup_jaccard_pairs",
                 "minhash_lsh_pairs", "dedup_edit_distance"):
        plan = plan_of(Q.queries()[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_brute_pairs_plan_is_scan_plus_mapinpandas(spark):
    """The rewritten recall oracle (cosine_all_pairs): the matrix rides
    a broadcast VARIABLE, so the Spark plan must move only the id
    column — no join, no Exchange, ReadSchema pruned to vec_id."""
    plan = plan_of(Q.queries()["embedding_neardup_pairs"](spark, SF_DIR))
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    # NO scan may read the vector column (check every ReadSchema
    # segment, not just the last — a regressed second scan must fail)
    segments = plan.split("ReadSchema")
    assert len(segments) > 1, "no scan in plan?"
    for seg in segments[1:]:
        assert "embedding" not in seg[:200]


def test_fastpath_has_no_exchange(spark):
    """The north-rule job is a single mapInPandas pass: scaling bounded
    by input splits only."""
    from nrt_spark.datagen import generate_tokens
    from nrt_spark.fastpath import rollup_compress_tokens

    toks = generate_tokens(spark, 50, n_obs=30)
    plan = plan_of(rollup_compress_tokens(toks))
    assert "Exchange" not in plan


def test_decompress_has_no_exchange(spark):
    """Read path: blocks -> long form without a shuffle or explode."""
    from nrt_spark.datagen import generate_tokens
    from nrt_spark.fastpath import rollup_compress_tokens
    from nrt_spark.compress import decompress_tier

    toks = generate_tokens(spark, 50, n_obs=30)
    plan = plan_of(decompress_tier(rollup_compress_tokens(toks)))
    assert "Exchange" not in plan
    assert "Generate" not in plan        # no JVM explode


def test_monitor_cogroup_single_shuffle_per_side(spark):
    """state ⋈ obs is a cogroup (no separate join stage): exactly one
    Exchange per input, keyed on the bucket."""
    from nrt_spark.datagen import generate_tokens
    from nrt_spark.engine import NrtEngine

    toks = generate_tokens(spark, 50, n_obs=30)
    eng = NrtEngine(spark, "ewma", num_buckets=4, trend=False)
    state = eng.fit(toks, history_end="2015-03-01")
    plan = plan_of(eng.monitor(state, toks))
    assert "FlatMapCoGroupsInPandas" in plan
    assert plan.count("Exchange") <= 3   # state side, obs side (+AQE reuse)
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_bucketed_monitor_has_no_exchange(spark, tmp_path):
    """The storage-partitioned monitor loop: state and tokens align by
    bucket(doc_id) layout, so the whole fit -> monitor pass plans as
    range(B) -> mapInPandas — zero Exchange, zero join, the shape a
    10^12-series Iceberg bucket(doc_id) table gets on a real cluster."""
    from nrt_spark.datagen import generate_tokens
    from nrt_spark.engine import NrtEngine, write_tokens_bucketed

    toks = generate_tokens(spark, 30, n_obs=40)
    path = str(tmp_path / "tb")
    write_tokens_bucketed(toks, path, num_buckets=4)
    eng = NrtEngine(spark, "ewma", num_buckets=4, trend=False)
    fit_plan = plan_of(eng.fit_bucketed(path, history_end="2016-05-10"))
    assert "Exchange" not in fit_plan
    state = eng.fit_bucketed(path, history_end="2016-05-10")
    eng.save_state(state, str(tmp_path / "st"))
    mon_plan = plan_of(eng.monitor_bucketed(str(tmp_path / "st"), path))
    assert "Exchange" not in mon_plan
    assert "Join" not in mon_plan


def test_corpus_pipeline_no_cross_join(spark):
    """The full corpus funnel (dedup -> near-dup -> decontaminate ->
    quality -> tokenize -> pack) must never plan a cartesian product or
    nested-loop join — every self-join keys on a digest/shingle/band
    hash."""
    from nrt_spark.dataops.corpus import build_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed, stages = build_corpus(docs, num_shards=4, seq_len=128)
    for name, df in list(stages.items()) + [("packed", packed)]:
        plan = plan_of(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_lttb_single_exchange(spark):
    """LTTB downsample: exactly ONE shuffle (the doc_id grouping) into
    the Arrow grouped-map kernel — at the bucketed/Iceberg layout even
    that disappears into storage partitioning."""
    plan = plan_of(Q.queries()["nrt_lttb_downsample"](spark, SF_DIR))
    assert plan.count("Exchange") == 1
    assert "FlatMapGroupsInPandas" in plan


def test_counter_rate_single_exchange(spark):
    """Reset-aware counter increase: the per-series window and the
    final aggregate share ONE hash partitioning on user_id — the
    partial aggregate folds map-side after the window, no second
    shuffle of the event rows."""
    plan = plan_of(Q.events_counter_rate(spark, SF_DIR))
    assert plan.count("Exchange") == 1
    assert "Window" in plan


def test_agg_variants_hll_partials_keyed_on_group_only(spark):
    """Round-6 sf10 regression pin: an HLL sketch co-located with an
    exact countDistinct of the same column makes the two-phase distinct
    rewrite key the partial aggregate on (group, distinct-value) and
    carry one ~10 KB HLL register array PER DISTINCT VALUE (~100 GB on
    a unique column at 10M rows; 298 s measured vs ~6 s split).  Pin:
    every partial_approx_count_distinct in the plan aggregates with
    keys = the group column only — never the distinct column."""
    plan = plan_of(Q.queries()["agg_variants"](spark, SF_DIR))
    lines = [ln for ln in plan.splitlines()
             if "partial_approx_count_distinct" in ln]
    assert lines, "HLL partials missing from the plan?"
    for ln in lines:
        keys = ln.split("keys=[", 1)[1].split("]", 1)[0]
        assert "user_id" not in keys and "event_id" not in keys, ln


def test_simhash_spread_single_exchange(spark):
    """Spread-before-explode must stay shuffle-NEUTRAL: the pre-explode
    repartition by doc_id is the one Exchange in the plan because the
    per-doc aggregate reuses its partitioning.  A regression that adds
    a second shuffle (or drops the spread) fails here."""
    plan = plan_of(Q.queries()["simhash_fingerprints"](spark, SF_DIR))
    assert plan.count("Exchange") == 1


def test_adaptive_spread_is_structural_noop_on_well_split_scan(
        spark, tmp_path):
    """spread_if_underpartitioned's cluster-safety claim, pinned in the
    EXECUTED plan: on a scan with >= defaultParallelism splits it must
    add NO Exchange (on a 100-TB table the repartition would be a
    pointless full shuffle); on a 1-split input — the compressed-text
    packing hazard it exists for — the Exchange must appear."""
    from pyspark.sql import functions as F

    from nrt_spark.dataops.dedup import spread_if_underpartitioned

    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    dp = spark.sparkContext.defaultParallelism

    # (a) well-split: one tiny file per partition -> >= dp scan splits
    many = str(tmp_path / "many")
    docs.repartition(2 * dp).write.parquet(many)
    src = spark.read.parquet(many)
    out = spread_if_underpartitioned(src).select(
        F.length("text").alias("n"))
    plan = executed_plan_of(out)
    assert "Exchange" not in plan, "no-op branch must not add a shuffle"

    # (b) 1-split: the spread must materialize as an Exchange
    one = str(tmp_path / "one")
    docs.coalesce(1).write.parquet(one)
    src1 = spark.read.parquet(one)
    out1 = spread_if_underpartitioned(src1).select(
        F.length("text").alias("n"))
    plan1 = executed_plan_of(out1)
    assert "Exchange" in plan1, "1-split input must be spread"
