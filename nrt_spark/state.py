"""Monitor state as a table: schema + converters.

The reference keeps per-pixel state as instance-attribute rasters and
serializes them to netCDF (nrt/monitor/__init__.py:413-491).  Here state
is a DataFrame with one row per doc_id — snapshots of it (parquet,
partitioned by bucket) are the checkpoint/restore mechanism, and the
``last_day`` column makes monitoring resumable/incremental: observations
at or before ``last_day`` are skipped exactly like NaN gaps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("mask", T.ByteType(), False),
    T.StructField("beta", T.ArrayType(T.DoubleType()), True),
    T.StructField("process", T.DoubleType(), True),
    T.StructField("boundary", T.DoubleType(), True),
    T.StructField("sigma", T.DoubleType(), True),
    T.StructField("rmse", T.DoubleType(), True),
    T.StructField("q25", T.DoubleType(), True),
    T.StructField("q75", T.DoubleType(), True),
    T.StructField("histsize", T.IntegerType(), True),
    T.StructField("n", T.IntegerType(), True),
    T.StructField("winsize", T.IntegerType(), True),
    T.StructField("window", T.ArrayType(T.DoubleType()), True),
    T.StructField("detection_date", T.IntegerType(), True),
    T.StructField("fit_start", T.IntegerType(), True),
    T.StructField("last_day", T.IntegerType(), True),
])

#: pandas column order matching STATE_SCHEMA
STATE_COLUMNS = [f.name for f in STATE_SCHEMA.fields]


def state_to_pdf(state: dict, doc_ids, bucket: int, last_day: np.ndarray
                 ) -> pd.DataFrame:
    """Kernel state dict (arrays over K series) -> one-row-per-doc pandas."""
    K = len(doc_ids)
    beta = state["beta"]           # (n_coef, K)
    window = state["window"]       # (D, K)
    winsize = state["winsize"]
    if window.shape[0] == 0 or not (winsize > 0).any():
        rows_window = [[]] * K
    else:
        win_cols = window.T.tolist()          # one C-level conversion
        rows_window = [win_cols[k][: int(winsize[k])] if winsize[k] > 0
                       else [] for k in range(K)]
    return pd.DataFrame({
        "doc_id": np.asarray(doc_ids),
        "bucket": np.full(K, bucket, dtype=np.int32),
        "mask": state["mask"].astype(np.int8),
        "beta": beta.T.tolist(),              # (K, n_coef) nested lists
        "process": state["process"].astype(np.float64),
        "boundary": state["boundary"].astype(np.float64),
        "sigma": state["sigma"].astype(np.float64),
        "rmse": state["rmse"].astype(np.float64),
        "q25": state["q25"].astype(np.float64),
        "q75": state["q75"].astype(np.float64),
        "histsize": state["histsize"].astype(np.int32),
        "n": state["n"].astype(np.int32),
        "winsize": state["winsize"].astype(np.int32),
        "window": rows_window,
        "detection_date": state["detection_date"].astype(np.int32),
        "fit_start": state["fit_start"].astype(np.int32),
        "last_day": np.asarray(last_day, dtype=np.int32),
    })[STATE_COLUMNS]


def pdf_to_state(pdf: pd.DataFrame) -> dict:
    """One-row-per-doc pandas -> kernel state dict (column order = pdf order)."""
    K = len(pdf)
    beta_lists = list(pdf["beta"])
    n_coef = max((len(b) for b in beta_lists if b is not None), default=0)
    beta = np.zeros((n_coef, K))
    for k, b in enumerate(beta_lists):
        if b is not None and len(b):
            beta[:, k] = np.asarray(b, dtype=np.float64)
    winsize = pdf["winsize"].to_numpy(dtype=np.int64, na_value=0)
    depth = int(winsize.max()) if K else 0
    window = np.zeros((depth, K))
    for k, w in enumerate(pdf["window"]):
        if w is not None and len(w):
            window[: len(w), k] = np.asarray(w, dtype=np.float64)
    return {
        "mask": pdf["mask"].to_numpy(dtype=np.uint8),
        "beta": beta,
        "process": pdf["process"].to_numpy(dtype=np.float64, na_value=np.nan),
        "boundary": pdf["boundary"].to_numpy(dtype=np.float64, na_value=np.nan),
        "sigma": pdf["sigma"].to_numpy(dtype=np.float64, na_value=np.nan),
        "rmse": pdf["rmse"].to_numpy(dtype=np.float64, na_value=np.nan),
        "q25": pdf["q25"].to_numpy(dtype=np.float64, na_value=np.nan),
        "q75": pdf["q75"].to_numpy(dtype=np.float64, na_value=np.nan),
        "histsize": pdf["histsize"].to_numpy(dtype=np.int64, na_value=0),
        "n": pdf["n"].to_numpy(dtype=np.int64, na_value=0),
        "winsize": winsize,
        "window": window,
        "detection_date": pdf["detection_date"].to_numpy(dtype=np.int64, na_value=0),
        "fit_start": pdf["fit_start"].to_numpy(dtype=np.int64, na_value=0),
    }
