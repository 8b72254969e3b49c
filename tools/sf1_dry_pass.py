#!/usr/bin/env python3
"""sf1 dry pass: the full query registry + DuckDB oracle at 10x the
driver's largest certified scale, with per-query wall times.

Runs every registry entry on Spark over the generated sf1 tables
(tools/gen_sf1.py) and its oracle SQL on DuckDB over the SAME files,
compares with the local twin's canonical form (bit-exact floats), and
prints one JSON line: per-query spark/oracle seconds + status, plus the
sf0.1 spark seconds for the scaling-ratio column in BENCH.md.

Superlinear watch: a query whose sf1/sf0.1 spark ratio is far above
10x is flagged (> 10 * SLACK).  Quadratic-by-design miners
(embedding_neardup_pairs, dedup_edit_distance) are expected to flag.

Usage:
  python tools/gen_sf1.py /tmp/nrt_sf1
  python tools/sf1_dry_pass.py [SF1_DIR] [--skip NAME,NAME...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SLACK = 3.0          # sf1/sf0.1 ratio above 10*SLACK flags superlinear
SF01 = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries whose full result is too large to collect at sf>=1 (round 6:
# events_rollup_tiers materialized 4.9M rows to the driver at sf10 just
# for hashing — 10.4x wall, plus GC debt polluting neighbor walls).
# These are certified by an ORDER-INDEPENDENT integer checksum computed
# INSIDE each engine (same polynomial both sides, summed as
# decimal/hugeint), so the comparison moves ONE row per engine.
# Maps name -> (spark_digest_fn, sql_digest_template): the digest is
# SCHEMA-SPECIFIC, so adding a query here requires writing a digest
# pair for ITS columns (the tier digest below only fits
# events_rollup_tiers).  Populated after the digest helpers.
DIGEST_QUERIES: dict = {}

# Queries certified by a PYTHON twin at this harness's scales instead
# of the registry's DuckDB SQL (dedup_clusters: the recursive-CTE
# closure is O(N*E) — quadratic in the pair graph — while the numpy
# union-find twin is O(E log N); label-identical to the CTE at
# sf0.001/sf0.01, pinned in tests/test_oracle_pipeline.py).
def _py_oracles():
    from nrt_spark.oracle import dedup_clusters_oracle

    return {"dedup_clusters": dedup_clusters_oracle}

# per-column primes; floor(x*1e4+0.5) is the repo's tie-free half-up
# double->int rule (doubles are bit-identical across engines here — the
# full-collect compare proved that at sf1 — so any deterministic map
# certifies)
_TIER_DIGEST_SQL = """
SELECT count(*) AS n_rows,
       CAST(CAST(sum(CAST((
           (CASE tier WHEN 'day' THEN 1 WHEN 'week' THEN 2 ELSE 3 END)
               * 1000003
           + user_id * 1009
           + date_diff('day', DATE '1970-01-01', CAST(bucket AS DATE))
               * 10007
           + n * 31
           + coalesce(CAST(floor(vsum * 10000 + 0.5) AS BIGINT), 0) * 7
           + coalesce(CAST(floor(mean * 10000 + 0.5) AS BIGINT), 0) * 11
           + coalesce(CAST(floor(vmin * 10000 + 0.5) AS BIGINT), 0) * 13
           + coalesce(CAST(floor(vmax * 10000 + 0.5) AS BIGINT), 0) * 17
           + coalesce(CAST(floor(last * 10000 + 0.5) AS BIGINT), 0) * 19
       ) AS HUGEINT)) AS HUGEINT) AS VARCHAR) AS digest
FROM ({sql}) t
"""


def _digest_tiers_spark(df):
    """Spark twin of _TIER_DIGEST_SQL over the events_rollup_tiers
    result schema (tier, user_id, bucket, n, vsum, mean, vmin, vmax,
    last)."""
    from pyspark.sql import functions as F

    def scaled(c, p):
        return F.coalesce(
            F.floor(F.col(c) * 10000 + F.lit(0.5)).cast("long"),
            F.lit(0).cast("long")) * F.lit(p)

    tcode = (F.when(F.col("tier") == "day", 1)
             .when(F.col("tier") == "week", 2).otherwise(3))
    day_num = F.datediff(F.col("bucket").cast("date"),
                         F.lit("1970-01-01")).cast("long")
    term = (tcode.cast("long") * 1000003
            + F.col("user_id").cast("long") * 1009
            + day_num * 10007
            + F.col("n").cast("long") * 31
            + scaled("vsum", 7) + scaled("mean", 11)
            + scaled("vmin", 13) + scaled("vmax", 17)
            + scaled("last", 19)).cast("decimal(38,0)")
    return df.agg(F.count("*").alias("n_rows"),
                  F.sum(term).cast("decimal(38,0)")
                  .cast("string").alias("digest"))


DIGEST_QUERIES["events_rollup_tiers"] = (_digest_tiers_spark,
                                         _TIER_DIGEST_SQL)


def canon(pdf):
    import numpy as np

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


def compare(got, want):
    import numpy as np

    if list(got.columns) != list(want.columns):
        return f"columns {list(got.columns)} != {list(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        g = got[c].to_numpy()
        if np.issubdtype(got[c].dtype, np.floating):
            w = want[c].to_numpy(dtype=np.float64)
            if not np.array_equal(np.nan_to_num(g, nan=-9e9),
                                  np.nan_to_num(w, nan=-9e9)):
                return f"float mismatch in {c}"
        elif (g != want[c].to_numpy()).any():
            return f"value mismatch in {c}"
    return None


def hw_control(spark, rows: int = 2_000_000_000) -> dict:
    """Host controls on both throttling axes — the pure-JVM range scan
    (same measurement as bench.run_hw_control, inside the harness's own
    session) plus the single-core numpy control.  The sandbox host oscillates between
    healthy (~1700-1900 at 8 cores) and degraded (~1200-1350) windows;
    sampling it before and after the pass lets a reader adjudicate
    wall-time drift between records as host drift vs plan regression
    (bench.py already embeds this denominator; round-7 measured two
    back-to-back full passes at 226s and 284s from host oscillation
    alone, so the dry pass needs it too)."""
    from pyspark.sql import functions as F

    spark.range(rows).select(F.avg(F.xxhash64("id"))).collect()  # warm
    t0 = time.time()
    spark.range(rows + 1).select(F.avg(F.xxhash64("id"))).collect()
    jvm = round(rows / (time.time() - t0) / 1e6, 1)
    # the python axis throttles independently of the JVM one (round-7:
    # numpy-heavy queries at 2.5x official walls under a 1900+ JVM
    # control) — sample both (bench.run_numpy_control, M elems/s)
    from bench import run_numpy_control

    return {"jvm_m_rows_s": jvm, "numpy_m_elems_s": run_numpy_control()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf1_dir", nargs="?", default="/tmp/nrt_sf1")
    ap.add_argument("--skip", default="",
                    help="comma-separated query names to skip")
    ap.add_argument("--only", default="",
                    help="comma-separated query names to run")
    ap.add_argument("--no-oracle", action="store_true",
                    help="spark-only timing pass (no DuckDB compare)")
    ap.add_argument("--digest", default="",
                    help="comma-separated query names to certify via "
                         "the GENERIC in-engine digest (schema-driven, "
                         "nrt_spark.oracle.generic_digest_*) instead of "
                         "collecting the full result — for results in "
                         "the tens of millions of rows at probe scales")
    ap.add_argument("--baseline-sf01", action="store_true",
                    help="also time each spark query at sf0.1 for the "
                         "scaling ratio")
    args = ap.parse_args()

    sf1 = args.sf1_dir
    # data-dependent oracle generators (ivf/lsh/multimodal) read this
    os.environ["NRT_TEST_SF_DIR"] = sf1

    import duckdb

    from nrt_spark import queries as Q
    from nrt_spark.oracle import generic_digest_spark
    from nrt_spark.queries_base import REGISTRY
    from nrt_spark.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        # partial probe dirs (e.g. the sf100 docs+events probe) only
        # carry the tables under test; views for absent files are
        # skipped and their queries simply error out as not-run
        if Path(f"{sf1}/{t}.parquet").exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf1}/{t}.parquet'")

    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}
    gdigest = {s for s in args.digest.split(",") if s}
    clash = gdigest & set(_py_oracles())
    if clash:
        # a python-twin query's oracle returns a full result frame; the
        # generic digest would reduce only the Spark side and the
        # compare would spuriously FAIL on shape
        ap.error(f"--digest cannot apply to python-twin queries "
                 f"{sorted(clash)}: their oracle compares the full "
                 f"result frame (drop them from --digest)")
    names = [n for n in Q.DRIVER_ORDER if n in Q.queries()]
    # RAW registry, not Q.oracle_sql(): the public accessor eagerly
    # renders every callable-generated oracle (IVF centroid training,
    # LSH probe buckets, multimodal features — all data-dependent on
    # $NRT_TEST_SF_DIR), which at probe scales is many minutes of
    # single-core numpy spent BEFORE the first query even under
    # --only.  Render lazily per executed query instead, so the cost
    # lands inside that query's oracle_sec and skipped queries pay
    # nothing.  (The driver's own compare runs at sf0.01 where the
    # eager render is cheap — this is a probe-harness concern only.)
    oracle = {n: REGISTRY[n][1] for n in Q.DRIVER_ORDER
              if REGISTRY[n][1] is not None}
    py_oracles = _py_oracles()
    out = {}
    # warm-up: pay the session cold-start (codegen, parquet footer
    # caches, JIT) OUTSIDE the first timed query — round 6 measured the
    # first slot (nrt_ewma_report) at 9.5s vs 2.2-2.6s for its four
    # siblings purely from placement
    t0 = time.time()
    for t in ("events", "lineitem", "documents"):
        if Path(f"{sf1}/{t}.parquet").exists():
            spark.read.parquet(f"{sf1}/{t}.parquet").count()
    warmup_sec = round(time.time() - t0, 2)
    ctl_before = hw_control(spark)
    for name in names:
        if name in skip or (only and name not in only):
            out[name] = {"status": "skipped"}
            continue
        rec = {}
        try:
            t0 = time.time()
            qdf = Q.queries()[name](spark, sf1)
            if name in DIGEST_QUERIES:
                qdf = DIGEST_QUERIES[name][0](qdf)
                rec["digest_mode"] = True
            elif name in gdigest:
                qdf = generic_digest_spark(qdf)
                rec["digest_mode"] = "generic"
            sdf = qdf.toPandas()
            rec["spark_sec"] = round(time.time() - t0, 2)
            # in digest mode keep the TRUE result cardinality (the
            # digest's n_rows), not the 1-row digest frame — it feeds
            # both the scaling read and the empty-result check below
            rec["rows"] = (int(sdf["n_rows"].iloc[0])
                           if "digest_mode" in rec else len(sdf))
            if args.baseline_sf01:
                # restore in a finally: a throw here would leave every
                # LATER query's data-dependent oracle generator reading
                # sf0.1 while Spark runs sf1 (spurious FAILs)
                try:
                    os.environ["NRT_TEST_SF_DIR"] = SF01
                    t0 = time.time()
                    q01 = Q.queries()[name](spark, SF01)
                    if name in DIGEST_QUERIES:
                        q01 = DIGEST_QUERIES[name][0](q01)
                    elif name in gdigest:
                        q01 = generic_digest_spark(q01)
                    q01.toPandas()
                    rec["spark_sec_sf01"] = round(time.time() - t0, 2)
                finally:
                    os.environ["NRT_TEST_SF_DIR"] = sf1
            if name in py_oracles and not args.no_oracle:
                fn = py_oracles[name]
                t0 = time.time()
                odf = fn(sf1)
                rec["oracle_sec"] = round(time.time() - t0, 2)
                rec["oracle_kind"] = "python-twin"
                err = compare(canon(sdf), canon(odf))
                rec["status"] = "pass" if err is None else f"FAIL: {err}"
            elif name in oracle and not args.no_oracle:
                # the timer starts BEFORE the lazy sql() render: a
                # data-dependent oracle (IVF centroid training, LSH
                # probe buckets) can spend minutes rendering at probe
                # scales, and a wall recorded in no field would break
                # spark_sec+oracle_sec totalling.  render_sec splits it
                # out so plan-vs-host adjudication can still separate
                # the numpy render from the DuckDB execution.
                t0 = time.time()
                sql = oracle[name]
                sql = sql() if callable(sql) else sql
                rec["oracle_render_sec"] = round(time.time() - t0, 2)
                if name in DIGEST_QUERIES:
                    sql = DIGEST_QUERIES[name][1].format(sql=sql)
                elif name in gdigest:
                    from nrt_spark.oracle import generic_digest_sql_for
                    sql = generic_digest_sql_for(con, sql)
                odf = con.sql(sql).df()
                rec["oracle_sec"] = round(time.time() - t0, 2)
                err = compare(canon(sdf), canon(odf))
                rec["status"] = "pass" if err is None else f"FAIL: {err}"
            else:
                rec["status"] = "rows_only" if rec["rows"] > 0 else \
                    "FAIL: empty"
        except Exception as exc:           # noqa: BLE001 - record & go on
            rec["status"] = f"ERROR: {type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        print(f"# {name}: {json.dumps(rec)[:240]}", flush=True)
        # pay the GC debt OUTSIDE the next query's timed window: a
        # multi-million-row toPandas leaves hundreds of MB of Arrow
        # batches in the driver JVM's old gen plus the pandas frames in
        # the Python heap, and the resulting full GCs landed inside
        # whatever query ran next — measured at sf10: the same
        # bitmask_filter_events read 56.0 s mid-batch (after the 2M-row
        # asof collect) and 4.4 s in a fresh session.  Dropping the
        # references and forcing both collectors here keeps each wall a
        # measurement of ITS query.
        sdf = odf = None                                  # noqa: F841
        import gc as _gc

        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:                  # noqa: BLE001 - best effort
            pass
    n_pass = sum(1 for r in out.values()
                 if r.get("status") in ("pass", "rows_only"))
    print(json.dumps({"sf1_dir": sf1, "warmup_sec": warmup_sec,
                      "hw_control": {"before": ctl_before,
                                     "after": hw_control(spark)},
                      "queries": out,
                      "passed": n_pass, "total": len(names)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
