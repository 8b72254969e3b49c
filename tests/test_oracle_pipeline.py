"""The single-process numpy oracle (nrt_spark.oracle) must reproduce the
distributed pipeline bit-for-bit: xxhash64 parity with the JVM, token
generation parity with the executors, and report parity for every
monitor.  This is what makes the generated monitor-report SQL oracles
(queries._report_oracle_sql) a real cross-check of the engine."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pathlib import Path

from pyspark.sql import functions as F

from nrt_spark.hashing import spark_xxhash64_str, xxh64


def test_xxh64_reference_vectors():
    """Public xxHash64 test vectors (xxHash repository README/spec)."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    # Spark seed-42 parity values, pinned from the JVM expression
    assert spark_xxhash64_str("") == -7444071767201028348
    from nrt_spark.hashing import spark_xxhash64_strs
    assert spark_xxhash64_strs("doc0000000007", "src") == \
        7658802493184085759  # pinned vs xxhash64('doc0000000007','src')


def test_xxh64_matches_spark(spark):
    vals = ["doc0000000000", "doc0000012345", "", "a", "ab", "abc",
            "abcd", "abcde", "12345678", "123456789", "x" * 31, "y" * 32,
            "z" * 33, "w" * 64, "hello world", "doc%010d"]
    df = spark.createDataFrame([(v,) for v in vals], "s string") \
        .select("s", F.xxhash64("s").alias("h"))
    for r in df.collect():
        assert spark_xxhash64_str(r["s"]) == r["h"], repr(r["s"])


def test_xxhash64_long_parity_with_spark(spark):
    """spark_xxhash64_long (the ivf sample-filter twin) == the JVM
    xxhash64 on bigint columns, across sign/magnitude edge cases."""
    from nrt_spark.hashing import spark_xxhash64_long

    vals = [0, 1, -1, 42, -42, 2**31, -(2**31), 2**63 - 1, -(2**63),
            1234567890123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long") \
        .select("v", F.xxhash64("v").alias("h"))
    for r in df.collect():
        assert spark_xxhash64_long(r["v"]) == r["h"], r["v"]


def test_local_datagen_matches_spark(spark):
    from nrt_spark.datagen import generate_tokens
    from nrt_spark.oracle import generate_tokens_local

    want = generate_tokens(spark, 40, n_obs=50).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = generate_tokens_local(40, n_obs=50) \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["source"]) == list(want["source"])  # chained-hash zipf
    for g, w in zip(got["tokens"], want["tokens"]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("monitor,kwargs", [
    ("ewma", dict(trend=False, sensitivity=5.0)),
    ("mosum", dict(trend=False, method="OLS")),
])
def test_report_oracle_matches_engine(spark, monitor, kwargs):
    """Distributed report == single-process oracle, byte-exact (the
    other monitors are covered by the driver-style SQL compare in
    test_queries_oracle.py — all five registry entries now carry the
    generated oracle)."""
    from nrt_spark.datagen import generate_tokens
    from nrt_spark.engine import NrtEngine
    from nrt_spark.oracle import report_oracle

    toks = generate_tokens(spark, 80, n_obs=90)
    eng = NrtEngine(spark, monitor, num_buckets=8, **kwargs)
    state = eng.fit(toks, history_end="2016-05-10")
    got = (NrtEngine.report(eng.monitor(state, toks)).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = report_oracle(monitor, n_docs=80, n_obs=90, **kwargs) \
        .sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(got["mask"].to_numpy(np.int64),
                                  want["mask"].to_numpy(np.int64))
    np.testing.assert_array_equal(
        got["detection_date"].to_numpy(np.int64),
        want["detection_date"].to_numpy(np.int64))
    gp = got["process"].to_numpy(np.float64)
    wp = want["process"].to_numpy(np.float64)
    assert np.all((gp == wp) | (np.isnan(gp) & np.isnan(wp)))


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_union_find_twin_matches_recursive_cte(sf_dir):
    """The numpy union-find twin (the sf>=10 certification oracle for
    dedup_clusters, where the recursive CTE is O(N*E)-infeasible) must
    be label-identical to the CTE closure at the scales where both
    run."""
    import duckdb

    from nrt_spark.oracle import dedup_clusters_oracle
    from nrt_spark.queries_docs import _dedup_clusters_sql

    if not Path(sf_dir).exists():
        pytest.skip("driver testdata not present")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    want = (con.sql(_dedup_clusters_sql()).df()
            .sort_values("cluster_id").reset_index(drop=True))
    got = (dedup_clusters_oracle(sf_dir)
           .sort_values("cluster_id").reset_index(drop=True))
    for c in ("cluster_id", "n_members", "member_checksum"):
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_union_find_handles_chains_and_order():
    """Min-label correctness on shapes that break naive one-pass
    hooking: a long chain presented in worst-case (reversed) order, a
    star, and disjoint pairs."""
    import numpy as np

    from nrt_spark.oracle import union_find_components

    # chain 9-8-7-...-0 given high-to-low, plus star at 100, pair (200,201)
    a = np.array([9, 8, 7, 6, 5, 4, 3, 2, 1, 100, 100, 100, 200])
    b = np.array([8, 7, 6, 5, 4, 3, 2, 1, 0, 101, 102, 103, 201])
    nodes, labels = union_find_components(a, b)
    lab = dict(zip(nodes.tolist(), labels.tolist()))
    assert all(lab[i] == 0 for i in range(10))
    assert all(lab[i] == 100 for i in (100, 101, 102, 103))
    assert lab[200] == lab[201] == 200


@pytest.mark.parametrize("qname", [
    "events_gapfill_day",       # bigint, date, boolean, double
    "events_process_values",    # strings + doubles
    "doc_fingerprints",         # strings / hashes
    "events_rollup_tiers",      # timestamp buckets + doubles
    "pricing_summary",          # decimals/doubles + strings
])
def test_generic_digest_cross_engine(spark, qname):
    """The schema-driven generic digest (the sf100 probe's certification
    path for results too large to collect) must produce the SAME
    (n_rows, digest) row from Spark and from DuckDB on identical
    parquet — across the full type palette the registry emits (ints,
    doubles, decimals, strings, dates, timestamps, booleans)."""
    import duckdb

    import __spark_entry__ as entry
    from nrt_spark.oracle import (generic_digest_spark,
                                  generic_digest_sql_for)

    sf = "/root/testdata/sf0.01"
    if not Path(sf).exists():
        pytest.skip("driver testdata not present")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sql = entry.oracle_sql()[qname]
    sql = sql() if callable(sql) else sql
    got = generic_digest_spark(
        entry.queries()[qname](spark, sf)).toPandas()
    want = con.sql(generic_digest_sql_for(con, sql)).df()
    assert int(got["n_rows"][0]) == int(want["n_rows"][0]) > 0
    assert got["digest"][0] == want["digest"][0]


def test_generic_digest_detects_single_value_change(spark):
    """Sensitivity: flipping ONE value in one row must change the
    digest (guards against a canonicalization that collapses values)."""
    from nrt_spark.oracle import generic_digest_spark

    base = spark.createDataFrame(
        [(1, 2.5, "a", True), (2, 3.5, "b", False)],
        "id long, v double, s string, f boolean")
    d1 = generic_digest_spark(base).collect()[0]
    bumped = base.withColumn(
        "v", F.when(F.col("id") == 2, 3.500001).otherwise(F.col("v")))
    d2 = generic_digest_spark(bumped).collect()[0]
    assert d1["n_rows"] == d2["n_rows"] == 2
    assert d1["digest"] != d2["digest"]


def test_generic_digest_adversarial_values(spark):
    """The renderings the round-7 review attacked, pinned cross-engine:
    doubles beyond the 9e12 band (an unbanded floor(x*1e6) overflows
    int64 — DuckDB aborts, Spark clamps), +/-Inf and NaN, strings
    containing the column separator / backslash / the null-mark glyph,
    and NULL vs the literal null-mark string (must NOT collide)."""
    import duckdb

    from nrt_spark.oracle import (generic_digest_spark,
                                  generic_digest_sql_for)

    rows = [
        (1, 1.0e13, "a|b", "c"),          # band-2 double, separator split L
        (2, -2.5e26, "a", "b|c"),         # band-3 negative, separator split R
        (3, float("inf"), "back\\slash", None),   # inf, backslash, NULL
        (4, float("-inf"), "∅", "x"),     # -inf, literal null-mark string
        (5, float("nan"), None, "∅"),     # NaN, NULL vs literal mark
        (6, 3.5e31, "p", "q"),            # beyond band 3 -> 'XL'
        (7, 123.4567891, "plain", "row"), # band-1 half-up
    ]
    sdf = spark.createDataFrame(
        rows, "id long, v double, s1 string, s2 string")
    got = generic_digest_spark(sdf).collect()[0]

    con = duckdb.connect()
    con.sql("CREATE TABLE t (id BIGINT, v DOUBLE, s1 VARCHAR, s2 VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO t VALUES (?, ?, ?, ?)", list(r))
    want = con.sql(generic_digest_sql_for(con, "SELECT * FROM t")).df()
    assert got["n_rows"] == int(want["n_rows"][0]) == len(rows)
    assert got["digest"] == want["digest"][0]

    # the two separator splits must NOT collide with each other: rows
    # ('a|b','c') and ('a','b|c') are distinct multisets
    one = spark.createDataFrame([(1, 0.0, "a|b", "c")],
                                "id long, v double, s1 string, s2 string")
    two = spark.createDataFrame([(1, 0.0, "a", "b|c")],
                                "id long, v double, s1 string, s2 string")
    d1 = generic_digest_spark(one).collect()[0]["digest"]
    d2 = generic_digest_spark(two).collect()[0]["digest"]
    assert d1 != d2
    # NULL must not collide with the literal null-mark string
    n1 = spark.createDataFrame([(1, 0.0, None, "z")],
                               "id long, v double, s1 string, s2 string")
    n2 = spark.createDataFrame([(1, 0.0, "∅", "z")],
                               "id long, v double, s1 string, s2 string")
    assert (generic_digest_spark(n1).collect()[0]["digest"]
            != generic_digest_spark(n2).collect()[0]["digest"])
