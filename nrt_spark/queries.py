"""Driver-contract query registry: every operator exposed as a
``(spark_fn, oracle_sql)`` pair.

Each entry's Spark implementation and ANSI-SQL oracle are written
against the same spec with matching column aliases, explicit casts and
rounded floats, so the driver's row-count + schema + value-hash compare
is deterministic.  SQL-inexpressible operators (the sequential monitor
engine, LSH internals, compression) register with ``sql=None`` and get
rows-only checks.

Determinism conventions:
- every float output is ``round(x, 2..6)``;
- every LIMIT has a total tiebreak order;
- date_trunc results are cast to DATE on both sides;
- DuckDB integer sums are cast to BIGINT (HUGEINT otherwise);
- hashing across engines is md5 (identical hex in Spark and DuckDB).
"""

from __future__ import annotations

from nrt_spark.queries_base import (REGISTRY, SUB_SQL, _t, q, sub)  # noqa: F401

# registration happens on import; the star re-exports keep every query
# function addressable as nrt_spark.queries.<name> (bench, tests and
# __spark_entry__ rely on that).  Import order is NOT load-bearing:
# emission order is governed solely by the explicit DRIVER_ORDER list
# below (which tests/test_queries_registry.py pins), never by
# REGISTRY insertion order
from nrt_spark.queries_relational import *  # noqa: F401,F403
from nrt_spark.queries_events import *  # noqa: F401,F403
from nrt_spark.queries_docs import *  # noqa: F401,F403
from nrt_spark.queries_nrt import *  # noqa: F401,F403
from nrt_spark.queries_streaming import *  # noqa: F401,F403
from nrt_spark.queries_composites import *  # noqa: F401,F403

# =========================================================================
# Driver emission order: the correctness harness records the FIRST 50
# entries of queries()/oracle_sql(), so the engine-specific flagships go
# first and the three streaming entries sit LAST (a streaming crash can't
# shadow any other row).  tests/test_queries_registry.py pins both the
# cap and the ordering.
# =========================================================================

DRIVER_ORDER = [
    # engine flagships: monitor reports, state resume, tiers, codecs, ANN
    "nrt_ewma_report", "nrt_cusum_report", "nrt_mosum_report",
    "nrt_iqr_report", "nrt_ccdc_report", "nrt_incremental_report",
    "nrt_rollup_day_tier", "nrt_rollup_checksum", "nrt_retention_certify",
    "nrt_lttb_downsample", "nrt_gorilla_stats",
    "pack_token_sequences", "lsh_topk_embeddings", "ivf_topk_embeddings",
    "multimodal_features",
    # relational / time-series / training-data surface
    "pricing_summary", "revenue_suite", "semi_anti_joins",
    "order_limit_setops", "agg_variants",
    "star_subquery_suite", "asof_join_clicks",
    "events_rollup_tiers", "events_gapfill_day", "events_process_values",
    "events_run_lengths", "events_scalar_stats", "bitmask_filter_events",
    "sessionize_events",
    "dedup_exact_docs", "dedup_edit_distance", "dedup_jaccard_pairs",
    "minhash_lsh_pairs", "simhash_fingerprints", "dedup_clusters",
    "decontaminate_docs", "repetition_stats",
    "doc_lang_quality", "token_count_suite", "doc_fingerprints",
    "tokenize_docs", "corpus_profile_suite",
    "cosine_topk_embeddings", "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "token_roundtrip_invariant", "band_ratio_checksum",
    # streaming LAST (crash isolation)
    "nrt_streaming_monitor_report", "nrt_streaming_rollup",
    "nrt_streaming_tier_upsert",
]


def queries():
    # explicit raise, not assert: python -O would strip an assert and
    # silently reintroduce the round-2 dropped-past-the-cap failure mode
    if set(DRIVER_ORDER) != set(REGISTRY):
        raise RuntimeError(
            "DRIVER_ORDER out of sync with REGISTRY: "
            f"{sorted(set(DRIVER_ORDER) ^ set(REGISTRY))}")
    return {name: REGISTRY[name][0] for name in DRIVER_ORDER}


_sql_cache: dict[str, str] = {}


def oracle_sql():
    """name -> ANSI SQL.  Entries registered with a callable (the
    generated monitor-report oracles) are rendered lazily and cached —
    importing this module stays cheap.

    CONTRACT: data-dependent generators (the IVF centroids and the LSH
    probe buckets) read the parquet at ``$NRT_TEST_SF_DIR`` (default
    /root/testdata/sf0.01 — the scale the driver compares at).  When
    comparing at any OTHER scale, export NRT_TEST_SF_DIR to that
    directory BEFORE the first oracle_sql() call (tests/conftest.py
    does this); a mismatch shows up as a spurious value-hash failure on
    exactly those two entries, not a silent pass."""
    out = {}
    for name in DRIVER_ORDER:
        _fn, sql = REGISTRY[name]
        if sql is None:
            continue
        if callable(sql):
            if name not in _sql_cache:
                _sql_cache[name] = sql()
            sql = _sql_cache[name]
        out[name] = sql
    return out
