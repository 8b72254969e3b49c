"""Zero-shuffle rollup + compression over the token table.

The token layout keys the whole series into one row, i.e. the data is
already *perfectly partitioned by doc_id*.  The generic tier pipeline
(explode -> shuffle -> groupBy -> collect_list -> encode) therefore does
two full shuffles it doesn't need.  This operator computes every tier's
buckets AND the Gorilla blocks in a single ``mapInPandas`` pass:

    scan -> [decode + bucket + aggregate + encode] -> write

No exchange anywhere in the plan; scaling is limited only by input
splits, which is exactly the property that survives a 1000-executor /
100 TB scale-up.  Bucket values are bit-identical to the Catalyst tier
path (same left-to-right fold per bucket; verified in tests).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

from nrt_spark.gorilla import encode_timestamps, encode_values
from nrt_spark.tokens import GAP_TOKEN, SCALE, EPOCH_DAY, CADENCE_DAYS

BLOCKS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tier", T.StringType(), False),
    T.StructField("n_points", T.IntegerType(), False),
    T.StructField("ts_block", T.BinaryType(), False),
    T.StructField("val_block", T.BinaryType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
])


def _bucket_starts(days: np.ndarray, tier: str) -> np.ndarray:
    """Tier bucket start (days since epoch) for each observation day.

    Matches Spark's ``date_trunc``: 'week' is ISO Monday-start
    (1970-01-01 was a Thursday, hence the +3 phase), 'month' via
    datetime64[M] truncation.
    """
    if tier == "day":
        return days
    if tier == "week":
        return days - (days + 3) % 7
    if tier == "month":
        d = days.astype("datetime64[D]")
        return d.astype("datetime64[M]").astype("datetime64[D]").astype(np.int64)
    raise ValueError(tier)


def _tier_points(days: np.ndarray, values: np.ndarray, tier: str):
    """(bucket_start_days, mean) per bucket, NaN-aware, with the same
    left-to-right fold order as the Catalyst partial aggregation."""
    starts = _bucket_starts(days, tier)
    # days ascending -> starts ascending; segment id per observation.
    # np.bincount accumulates strictly in input order (unlike
    # add.reduceat's pairwise tree), which is what makes the sums
    # bit-identical to Catalyst's sequential partial-aggregate fold.
    seg = np.concatenate(([0], np.cumsum(np.diff(starts) != 0)))
    nseg = int(seg[-1]) + 1 if len(seg) else 0
    bucket_days = starts[np.concatenate(([True], np.diff(starts) != 0))]
    valid = ~np.isnan(values)
    vz = np.where(valid, values, 0.0)
    sums = np.bincount(seg, weights=vz, minlength=nseg)
    cnts = np.bincount(seg, weights=valid.astype(np.float64),
                       minlength=nseg)
    with np.errstate(invalid="ignore", divide="ignore"):
        means = np.where(cnts > 0, sums / cnts, np.nan)
    return bucket_days, means


def _tier_points_batch(days: np.ndarray, values: np.ndarray,
                       doc_lens: np.ndarray, tier: str):
    """Batched :func:`_tier_points` over the concatenation of many docs.

    Args:
        days/values: concatenated per-doc arrays (each doc's days
            ascending).
        doc_lens: per-doc element counts.

    Returns:
        (block_lens, bucket_days_cat, means_cat): per-doc bucket counts
        plus the concatenated bucket streams, same fold semantics as the
        per-doc version (np.bincount = sequential in input order).
    """
    from nrt_spark.gorilla import _seg_arange  # segmented arange helper

    starts = _bucket_starts(days, tier)
    doc_of = np.repeat(np.arange(len(doc_lens)), doc_lens)
    new_seg = np.empty(len(starts), dtype=bool)
    new_seg[0] = True
    new_seg[1:] = (np.diff(starts) != 0) | (np.diff(doc_of) != 0)
    seg = np.cumsum(new_seg) - 1
    nseg = int(seg[-1]) + 1 if len(seg) else 0
    bucket_days = starts[new_seg]
    valid = ~np.isnan(values)
    sums = np.bincount(seg, weights=np.where(valid, values, 0.0),
                       minlength=nseg)
    cnts = np.bincount(seg, weights=valid.astype(np.float64),
                       minlength=nseg)
    with np.errstate(invalid="ignore", divide="ignore"):
        means = np.where(cnts > 0, sums / cnts, np.nan)
    block_lens = np.bincount(doc_of[new_seg], minlength=len(doc_lens))
    return block_lens, bucket_days, means


#: sentinel for NaN means in the integer codec (far outside any real
#: scaled value)
INT_NAN_SENTINEL = -(1 << 40)


def encode_means_int(means: np.ndarray, scale: float) -> bytes:
    """Quantized-value codec: scaled-int delta-of-delta (reuses the
    timestamp codec — any int64 stream works).  Decimal-quantized values
    have full float mantissas, so float-XOR only halves them; small
    integer deltas pack into the 7/9/12-bit classes (~1-2 B/pt)."""
    ints = np.where(np.isnan(means), INT_NAN_SENTINEL,
                    np.rint(np.nan_to_num(means) * scale)).astype(np.int64)
    return encode_timestamps(ints)


def dequantize_ints(ints: np.ndarray, scale: float) -> np.ndarray:
    """Inverse of the scaled-int quantizer: sentinel -> NaN, ints/scale.
    The ONE place the dequantize contract lives (the Spark read path and
    the per-blob decoder both call it)."""
    return np.where(ints == INT_NAN_SENTINEL, np.nan, ints / scale)


def decode_means_int(blob: bytes, scale: float) -> np.ndarray:
    from nrt_spark.gorilla import decode_timestamps

    return dequantize_ints(decode_timestamps(blob), scale)


def rollup_compress_tokens(tokens_df: DataFrame,
                           tiers: tuple = ("day", "week", "month"),
                           int_scale: float | None = None) -> DataFrame:
    """tokens -> per-(doc, tier) Gorilla blocks of bucket means, in one
    shuffle-free pass.

    ``int_scale``: when set, value blocks use the scaled-int
    delta-of-delta codec instead of float XOR (lossy at 1/int_scale
    resolution — exact when the input values are quantized at or below
    that resolution, e.g. day-tier means of token data with
    ``int_scale >= SCALE * max bucket size``).
    """
    tiers = tuple(tiers)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nrt_spark.gorilla import (_seg_arange, encode_int_streams,
                                       encode_float_streams)

        for pdf in batches:
            tok_arrays = [np.asarray(t, dtype=np.float64)
                          for t in pdf["tokens"]]
            keep = [i for i, t in enumerate(tok_arrays) if len(t)]
            if not keep:
                yield pd.DataFrame({k: [] for k in (
                    "doc_id", "tier", "n_points", "ts_block", "val_block",
                    "n_bytes")})
                continue
            docs = pdf["doc_id"].to_numpy()[keep]
            doc_lens = np.array([len(tok_arrays[i]) for i in keep])
            toks = np.concatenate([tok_arrays[i] for i in keep])
            values = np.where(toks == GAP_TOKEN, np.nan, toks / SCALE)
            days = EPOCH_DAY + CADENCE_DAYS * _seg_arange(doc_lens)
            out = {k: [] for k in ("doc_id", "tier", "n_points",
                                   "ts_block", "val_block", "n_bytes")}
            for tier in tiers:
                block_lens, bdays, means = _tier_points_batch(
                    days, values, doc_lens, tier)
                splits = np.cumsum(block_lens)[:-1]
                ts_streams = np.split(bdays * 86400, splits)
                if int_scale is None:
                    vbs = encode_float_streams(np.split(means, splits))
                else:
                    ints = np.where(np.isnan(means), INT_NAN_SENTINEL,
                                    np.rint(np.nan_to_num(means) * int_scale)
                                    ).astype(np.int64)
                    vbs = encode_int_streams(np.split(ints, splits))
                tbs = encode_int_streams(ts_streams)
                out["doc_id"] += list(docs)
                out["tier"] += [tier] * len(tbs)
                out["n_points"] += [int(x) for x in block_lens]
                out["ts_block"] += tbs
                out["val_block"] += vbs
                out["n_bytes"] += [len(a) + len(b) for a, b in zip(tbs, vbs)]
            yield pd.DataFrame(out)

    return tokens_df.select("doc_id", "tokens").mapInPandas(
        run, BLOCKS_SCHEMA)
