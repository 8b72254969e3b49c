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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf1_dir", nargs="?", default="/tmp/nrt_sf1")
    ap.add_argument("--skip", default="",
                    help="comma-separated query names to skip")
    ap.add_argument("--only", default="",
                    help="comma-separated query names to run")
    ap.add_argument("--no-oracle", action="store_true",
                    help="spark-only timing pass (no DuckDB compare)")
    ap.add_argument("--baseline-sf01", action="store_true",
                    help="also time each spark query at sf0.1 for the "
                         "scaling ratio")
    args = ap.parse_args()

    sf1 = args.sf1_dir
    # data-dependent oracle generators (ivf/lsh/multimodal) read this
    os.environ["NRT_TEST_SF_DIR"] = sf1

    import duckdb

    from nrt_spark import queries as Q
    from nrt_spark.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf1}/{t}.parquet'")

    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}
    names = [n for n in Q.DRIVER_ORDER if n in Q.queries()]
    oracle = Q.oracle_sql()
    out = {}
    for name in names:
        if name in skip or (only and name not in only):
            out[name] = {"status": "skipped"}
            continue
        rec = {}
        try:
            t0 = time.time()
            sdf = Q.queries()[name](spark, sf1).toPandas()
            rec["spark_sec"] = round(time.time() - t0, 2)
            rec["rows"] = len(sdf)
            if args.baseline_sf01:
                # restore in a finally: a throw here would leave every
                # LATER query's data-dependent oracle generator reading
                # sf0.1 while Spark runs sf1 (spurious FAILs)
                try:
                    os.environ["NRT_TEST_SF_DIR"] = SF01
                    t0 = time.time()
                    Q.queries()[name](spark, SF01).toPandas()
                    rec["spark_sec_sf01"] = round(time.time() - t0, 2)
                finally:
                    os.environ["NRT_TEST_SF_DIR"] = sf1
            if name in oracle and not args.no_oracle:
                sql = oracle[name]
                sql = sql() if callable(sql) else sql
                t0 = time.time()
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
    print(json.dumps({"sf1_dir": sf1, "queries": out,
                      "passed": n_pass, "total": len(names)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
