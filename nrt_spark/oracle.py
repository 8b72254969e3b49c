"""Single-process numpy oracle for the monitor engine.

Recomputes, without a SparkSession, exactly what the distributed
fit -> monitor -> report pipeline produces on the deterministic
synthetic token table:

- seeds come from a pure-Python xxHash64 (:mod:`nrt_spark.hashing`)
  reproducing Spark's ``xxhash64(doc_id)``;
- token rows come from the same :func:`nrt_spark.datagen._gen_batch`
  the executors run (pure pandas/numpy, seed-deterministic);
- the monitor runs the shared numpy kernels over the full (M, K)
  matrix in ONE process — no bucketing, no shuffle, no Arrow.

Because the engine hash-buckets series and cogroups state with
observations, byte-equality against this oracle checks the entire
distributed plumbing (bucketing, cogrouped alignment, state round-trip,
last_day masking), not just the kernels.  The driver-facing report
queries embed this oracle's output as SQL literals so the cross-engine
harness records the comparison (see queries._report_oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from nrt_spark.datagen import _gen_batch
from nrt_spark.hashing import spark_xxhash64_str
from nrt_spark.kernels.monitors import fit_state, resolve_params, run_monitor
from nrt_spark.tokens import grid_days, tokens_to_matrix


def generate_tokens_local(n_docs: int, n_obs: int = 130,
                          break_frac: float = 0.5, gap_frac: float = 0.08,
                          noise: float = 0.02) -> pd.DataFrame:
    """Numpy twin of :func:`nrt_spark.datagen.generate_tokens` (token
    stream only; ``source`` is not reproduced — it derives from a second
    hash the report pipeline never reads)."""
    doc_ids = [f"doc{i:010d}" for i in range(n_docs)]
    seeds = np.array([spark_xxhash64_str(d) for d in doc_ids],
                     dtype=np.int64)
    pdf = pd.DataFrame({"doc_id": doc_ids, "seed64": seeds,
                        "src_u": np.zeros(n_docs)})
    return _gen_batch(pdf, n_obs, break_frac, gap_frac, noise,
                      bands=False, outlier_frac=0.0)


def report_oracle(monitor: str, n_docs: int = 300, n_obs: int = 130,
                  history_end: str = "2016-05-10", **params) -> pd.DataFrame:
    """Expected ``NrtEngine.report`` rows (doc_id, mask, detection_date,
    process) for the synthetic table — single-process, no Spark."""
    toks = generate_tokens_local(n_docs, n_obs=n_obs)
    y = tokens_to_matrix(list(toks["tokens"]))
    days = grid_days(n_obs)
    p = resolve_params(monitor, **params)
    he_day = int(np.datetime64(history_end, "D").astype(int))
    hist = days <= he_day
    state = fit_state(y[hist], days[hist], p)
    run_monitor(state, y[~hist], days[~hist], p)
    return pd.DataFrame({
        "doc_id": toks["doc_id"],
        "mask": state["mask"].astype(np.int32),
        "detection_date": state["detection_date"].astype(np.int32),
        "process": state["process"].astype(np.float64),
    })
