"""Registry hygiene: the driver's correctness harness records at most
the FIRST 50 entries of queries()/oracle_sql(), in emission order.
Round 2 lost all 15 engine-flagship rows to that cap; these tests make
the failure mode impossible to reintroduce silently.
"""

from __future__ import annotations

from nrt_spark import queries as Q

DRIVER_CAP = 50

ENGINE_FLAGSHIPS = {
    "nrt_ewma_report", "nrt_cusum_report", "nrt_mosum_report",
    "nrt_iqr_report", "nrt_ccdc_report", "nrt_incremental_report",
    "nrt_rollup_day_tier", "nrt_rollup_checksum", "nrt_retention_certify",
    "nrt_lttb_downsample", "nrt_gorilla_stats",
    "pack_token_sequences", "lsh_topk_embeddings", "ivf_topk_embeddings",
    "multimodal_features", "nrt_streaming_monitor_report",
    "nrt_streaming_rollup", "nrt_streaming_tier_upsert",
}


def test_registry_fits_driver_window():
    names = list(Q.queries())
    assert len(names) <= DRIVER_CAP, (
        f"{len(names)} registry entries exceed the driver's "
        f"{DRIVER_CAP}-row correctness window; consolidate or demote "
        f"to sub() before adding more")


def test_every_flagship_inside_window():
    names = list(Q.queries())[:DRIVER_CAP]
    missing = ENGINE_FLAGSHIPS - set(names)
    assert not missing, f"flagships outside the driver window: {missing}"


def test_order_is_engine_first_streaming_last():
    names = list(Q.queries())
    assert set(names[:15]) == ENGINE_FLAGSHIPS - {
        "nrt_streaming_monitor_report", "nrt_streaming_rollup",
        "nrt_streaming_tier_upsert"}
    # streaming last: a streaming crash can't shadow any other row
    assert names[-3:] == ["nrt_streaming_monitor_report",
                          "nrt_streaming_rollup",
                          "nrt_streaming_tier_upsert"]


def test_queries_and_oracle_sql_agree():
    qs = list(Q.queries())
    osql = Q.oracle_sql()
    assert set(osql) <= set(qs)
    # oracle_sql preserves the same relative order
    pos = {n: i for i, n in enumerate(qs)}
    order = [pos[n] for n in osql]
    assert order == sorted(order)


def test_sub_entries_not_registered():
    # demoted sub-queries must not leak back into the driver registry
    assert not set(Q.SUB_SQL) & set(Q.REGISTRY)
