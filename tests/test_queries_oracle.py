"""Local twin of the driver's correctness gate: run every registered
query on Spark and its oracle SQL on DuckDB over the same parquet files,
compare row count, column names, and (order-insensitively) values.

Runs at sf0.001 for speed; the driver repeats this at sf0.01.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

from nrt_spark import queries as Q

import os
SF_DIR = os.environ.get("NRT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

pytestmark = pytest.mark.skipif(not Path(SF_DIR).exists(),
                                reason="driver testdata not present")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{SF_DIR}/{t}.parquet'")
    return con


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted
    by every column, floats rounded to 9 significant-ish decimals."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(9)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif pdf[c].dtype == bool:
            pdf[c] = pdf[c].astype(int)
        else:
            try:
                pdf[c] = pdf[c].astype("int64")
            except (TypeError, ValueError, OverflowError):
                pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(Q.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    fn = Q.queries()[name]
    sql = Q.oracle_sql()[name]
    got = canon(fn(spark, SF_DIR).toPandas())
    want = canon(ddb.sql(sql).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} != {len(want)} rows"
    for c in got.columns:
        if np.issubdtype(got[c].dtype, np.floating):
            # bit-exact: every oracle query is engineered so both engines
            # compute identical doubles (integer-cent sums, shared
            # rounding conventions); regressions here mean a real
            # cross-engine divergence the driver's value-hash would hit
            np.testing.assert_array_equal(
                np.nan_to_num(got[c].to_numpy(), nan=-9e9),
                np.nan_to_num(want[c].to_numpy(dtype=np.float64), nan=-9e9),
                err_msg=f"{name}.{c}")
        else:
            mism = (got[c].to_numpy() != want[c].to_numpy())
            assert not mism.any(), (
                f"{name}.{c}: {mism.sum()} mismatches, e.g. "
                f"{got[c][mism][:3].tolist()} vs {want[c][mism][:3].tolist()}")


ROWS_ONLY = sorted(set(Q.queries()) - set(Q.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = Q.queries()[name](spark, SF_DIR)
    assert df.count() > 0, f"{name} returned no rows"


def test_entry_flagship(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    n = df.count()
    assert n > 0
    assert {"user_id", "day", "mean", "ewma", "process",
            "is_break"} <= set(df.columns)


def test_counter_rate_matches_sequential_fold(spark, tmp_path):
    """events_counter_rate (the windowed Catalyst formula) equals a
    sequential PromQL-style fold on adversarial synthetic data: resets,
    equal consecutive readings, same-timestamp ties broken by event_id,
    and a single-reading user (whose sum over zero pairs must be 0)."""
    import datetime as dt

    import numpy as np

    from nrt_spark import queries as Q

    base = dt.datetime(2024, 1, 1)
    rows = []
    series = {
        1: [10.0, 12.5, 12.5, 3.0, 7.25, 0.0, 0.0, 99.99],  # 2 resets
        2: [5.0],                                           # single reading
        3: [1.0, 1.0, 1.0],                                 # flat
        4: [100.0, 0.01, 100.0, 0.01],                      # thrash
    }
    eid = 0
    for uid, vals in series.items():
        for i, v in enumerate(vals):
            # user 4: same-ts pairs so event_id breaks the tie
            ts = base + dt.timedelta(hours=i // 2 if uid == 4 else i)
            rows.append((eid, ts, uid, "click", v, "{}"))
            eid += 1
    (spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
     .write.parquet(str(tmp_path / "events.parquet")))

    got = {r["user_id"]: (r["increase_e2"], r["n_resets"]) for r in
           Q.events_counter_rate(spark, str(tmp_path)).collect()}

    for uid, vals in series.items():
        cents = [int(np.round(v * 100)) for v in vals]
        total = resets = 0
        for prev, cur in zip(cents[:-1], cents[1:]):
            if cur >= prev:
                total += cur - prev
            else:
                total += cur
                resets += 1
        assert got[uid] == (total, resets), uid


def test_collapsed_branch_matches_oracle_on_duplicated_corpus(
        spark, tmp_path, monkeypatch):
    """End-to-end pin of the duplicate-collapse branches: a corpus
    duplicated far past the gate threshold (10 exact copies of every
    sf0.01 doc — the sampled ratio reads ~0.1) must still match the
    full uncollapsed DuckDB oracle bit-for-bit on every
    duplicate-adaptive text query.  This is the branch the sf100 probe
    runs; the driver-scale corpora are unique, so without this test the
    collapsed plans would only ever be certified at probe scales.

    The gate is FORCED (monkeypatched to 0.0) so every query provably
    takes the collapsed branch: decontaminate_docs gates on its
    FILTERED train relation, whose ~2%-fallback sample at this corpus
    size lands under the 2000-row trust floor — with the real sampled
    gate its collapsed path would silently never run here (the gate's
    own regimes are pinned separately in
    test_duplicate_ratio_gate_regimes)."""
    from pyspark.sql import functions as F

    from nrt_spark.dataops.dedup import (COLLAPSE_RATIO,
                                         duplicate_ratio_estimate)

    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    dup = base
    for k in range(1, 10):
        dup = dup.unionAll(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(10**9 * k)))
    path = str(tmp_path / "documents.parquet")
    dup.write.parquet(path)
    docs = spark.read.parquet(path)
    assert duplicate_ratio_estimate(docs) < COLLAPSE_RATIO  # gate regime
    monkeypatch.setattr("nrt_spark.dataops.dedup.duplicate_ratio_estimate",
                        lambda docs, **kw: 0.0)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    for name in ("repetition_stats", "decontaminate_docs", "tokenize_docs",
                 "simhash_fingerprints", "doc_lang_quality",
                 "token_count_suite"):
        got = canon(Q.queries()[name](spark, str(tmp_path)).toPandas())
        want = canon(con.sql(Q.oracle_sql()[name]).df())
        assert list(got.columns) == list(want.columns), name
        assert len(got) == len(want), \
            f"{name}: {len(got)} != {len(want)} rows"
        for c in got.columns:
            if np.issubdtype(got[c].dtype, np.floating):
                np.testing.assert_array_equal(
                    np.nan_to_num(got[c].to_numpy(), nan=-9e9),
                    np.nan_to_num(want[c].to_numpy(dtype=np.float64),
                                  nan=-9e9),
                    err_msg=f"{name}.{c}")
            else:
                mism = (got[c].to_numpy() != want[c].to_numpy())
                assert not mism.any(), f"{name}.{c}: {mism.sum()} mismatches"
