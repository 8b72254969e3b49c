"""Token codec: pre-tokenized sequences <-> time-series values.

The engine's primary input is a table of pre-tokenized training sequences
``(doc_id string, tokens array<int>, n_tok int, source string)``
(BASELINE.json input_hint).  The decode is deterministic and positional:

- ``ts[i] = 2015-01-01 + i * 5 days`` (Sentinel-2-like revisit cadence;
  the reference's history periods are multi-year slices of such series,
  /root/reference/tests/integration_tests/conftest.py:38-39)
- token ``-1`` is the reserved gap token (cloud-masked obs -> NULL/NaN)
- value token t decodes to ``t / 10000.0`` (NDVI-like [-1, 1] range)

Both a Catalyst (column-expression) decode for relational pipelines and a
numpy decode for inside grouped UDFs are provided; they agree bit-exactly
because both compute ``int / 10000.0`` in float64.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

GAP_TOKEN = -1
SCALE = 10000.0
EPOCH_DATE = "2015-01-01"
EPOCH_DAY = 16436  # days from 1970-01-01 to 2015-01-01
CADENCE_DAYS = 5


def decode_long(tokens_df: DataFrame) -> DataFrame:
    """tokens table -> long form ``(doc_id, source, pos, ts, value)``.

    Pure Catalyst: posexplode + arithmetic; gap tokens become NULL.  The
    explode multiplies rows by n_tok, so downstream aggregations should
    project only needed columns (Catalyst prunes the rest).
    """
    return (
        tokens_df
        .select("doc_id", "source", F.posexplode("tokens").alias("pos", "token"))
        .withColumn("ts", F.expr(
            f"timestamp(date_add(date'{EPOCH_DATE}', pos * {CADENCE_DAYS}))"))
        .withColumn("value", F.when(F.col("token") == GAP_TOKEN, F.lit(None))
                    .otherwise(F.col("token") / F.lit(SCALE)))
        .drop("token")
    )


def tokens_to_matrix(token_lists, max_len: int | None = None) -> np.ndarray:
    """Stack per-row token arrays into the reference's (M, K) float64 matrix.

    Shorter series are right-padded with NaN; gap tokens decode to NaN.
    This reproduces the reference's vectorization axis
    (nrt/monitor/__init__.py:192) inside a grouped UDF.
    """
    K = len(token_lists)
    M = max_len or (max((len(t) for t in token_lists), default=0))
    y = np.full((M, K), np.nan, dtype=np.float64)
    for k, toks in enumerate(token_lists):
        a = np.asarray(toks, dtype=np.float64)
        a[a == GAP_TOKEN] = np.nan
        y[: len(a), k] = a / SCALE
    return y


def grid_days(n: int) -> np.ndarray:
    """Days-since-epoch for positions 0..n-1 of the decode grid."""
    return EPOCH_DAY + CADENCE_DAYS * np.arange(n, dtype=np.int64)


def values_to_tokens(values: np.ndarray) -> np.ndarray:
    """Inverse decode: float values -> int32 tokens (NaN -> gap token).

    Round-trips exactly for tokens produced by the generator because the
    decode divides by a power-of-ten constant in float64.
    """
    out = np.where(np.isnan(values), GAP_TOKEN,
                   np.rint(np.nan_to_num(values) * SCALE)).astype(np.int32)
    return out
