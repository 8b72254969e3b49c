"""Gorilla codec round-trip + compression-ratio properties (no Spark)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from nrt_spark import gorilla as g


def test_timestamps_regular_grid():
    ts = np.arange(0, 86400 * 365, 86400, dtype=np.int64)
    blob = g.encode_timestamps(ts)
    np.testing.assert_array_equal(g.decode_timestamps(blob), ts)
    # regular grid: ~1 bit/step after the header
    assert len(blob) < 4 + 8 + 4 + len(ts) // 8 + 8


def test_timestamps_irregular():
    rng = np.random.RandomState(0)
    ts = np.cumsum(rng.randint(1, 10_000_000, size=500)).astype(np.int64)
    np.testing.assert_array_equal(
        g.decode_timestamps(g.encode_timestamps(ts)), ts)


def test_values_roundtrip_with_nan():
    rng = np.random.RandomState(1)
    v = np.round(rng.normal(0.5, 0.1, 300), 4)
    v[::17] = np.nan
    out = g.decode_values(g.encode_values(v))
    np.testing.assert_array_equal(v.view(np.uint64), out.view(np.uint64))


def test_values_constant_series_compresses_hard():
    v = np.full(1000, 0.4321)
    blob = g.encode_values(v)
    # 1 bit per repeated value
    assert len(blob) < 4 + 8 + 1000 // 8 + 8


@pytest.mark.parametrize("n", [0, 1, 2])
def test_tiny_blocks(n):
    ts = np.arange(n, dtype=np.int64) * 60
    v = np.linspace(0, 1, n)
    t2, v2 = g.decode_block(*g.encode_block(ts, v)[:2])
    np.testing.assert_array_equal(t2, ts)
    np.testing.assert_array_equal(v2, v)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=True,
                          width=64), max_size=120))
def test_values_roundtrip_property(vals):
    v = np.array(vals, dtype=np.float64)
    out = g.decode_values(g.encode_values(v))
    np.testing.assert_array_equal(v.view(np.uint64), out.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-2**40, max_value=2**40), min_size=0,
                max_size=120))
def test_timestamps_roundtrip_property(ts_list):
    ts = np.array(sorted(ts_list), dtype=np.int64)
    np.testing.assert_array_equal(
        g.decode_timestamps(g.encode_timestamps(ts)), ts)


def test_batch_encoders_byte_equal_per_block():
    """encode_int_streams / encode_float_streams must be byte-identical
    to the per-block encoders over random blocks (NaN, all-identical,
    tiny, empty), including across the 256-block chunk boundary."""
    rng = np.random.RandomState(5)
    ints, floats = [], []
    for k in range(600):  # > 2 chunks
        n = rng.randint(0, 180)
        ints.append(np.cumsum(rng.randint(1, 10 ** 6, size=n)).astype(np.int64)
                    - 5 * 10 ** 5 if n else np.array([], dtype=np.int64))
        v = np.round(rng.normal(0.5, 0.1, n), 4)
        if n:
            v[rng.random_sample(n) < 0.1] = np.nan
            if k % 13 == 0:
                v[:] = 0.77
        floats.append(v)
    bi = g.encode_int_streams(ints)
    bf = g.encode_float_streams(floats)
    for k in range(600):
        assert bi[k] == g.encode_timestamps(ints[k]), f"int {k}"
        assert bf[k] == g.encode_values_fast(floats[k]), f"float {k}"
        np.testing.assert_array_equal(g.decode_timestamps(bi[k]), ints[k])
        out = g.decode_values(bf[k])
        np.testing.assert_array_equal(out.view(np.uint64),
                                      np.asarray(floats[k]).view(np.uint64))


def test_batched_decoders_roundtrip_all_encoders():
    """decode_*_streams must invert every encoder variant (per-point
    greedy, static-window fast, batched) on fuzzed mixed-size blocks
    with NaNs, identical runs, negatives and raw-64 dods."""
    from nrt_spark.gorilla import (
        decode_float_streams, decode_int_streams, encode_float_streams,
        encode_int_streams, encode_timestamps, encode_timestamps_fast,
        encode_values, encode_values_fast)

    rng = np.random.Generator(np.random.PCG64(123))
    fl, it = [], []
    for _ in range(300):
        n = int(rng.integers(0, 150))
        v = rng.standard_normal(n) * (10 ** int(rng.integers(-2, 3)))
        v[rng.random(n) < 0.1] = np.nan
        if n > 3 and rng.random() < 0.3:
            v[1:4] = v[0]
        fl.append(v)
        deltas = rng.integers(-3000, 3000, size=max(n - 1, 0))
        if n > 5 and rng.random() < 0.2:
            deltas[2] = int(rng.integers(-10 ** 9, 10 ** 9))
        ts = (int(rng.integers(-10 ** 12, 10 ** 12))
              + np.concatenate(([0], np.cumsum(deltas))).astype(np.int64)
              if n else np.array([], dtype=np.int64))
        it.append(ts)

    for blobs in ([encode_values(v) for v in fl],
                  [encode_values_fast(v) for v in fl],
                  encode_float_streams(fl)):
        for a, b in zip(fl, decode_float_streams(blobs)):
            np.testing.assert_array_equal(
                np.asarray(a, dtype=np.float64).view(np.uint64),
                b.view(np.uint64))
    for blobs in ([encode_timestamps(t) for t in it],
                  [encode_timestamps_fast(t) for t in it],
                  encode_int_streams(it)):
        for a, b in zip(it, decode_int_streams(blobs)):
            np.testing.assert_array_equal(a, b)


def test_batched_decode_matches_per_point():
    """Batched decode == per-point reference decode, bit for bit."""
    from nrt_spark.gorilla import (
        decode_float_streams, decode_int_streams, decode_timestamps,
        decode_values, encode_float_streams, encode_int_streams)

    rng = np.random.Generator(np.random.PCG64(9))
    fl = [np.round(rng.standard_normal(130), 4) for _ in range(50)]
    it = [np.arange(130, dtype=np.int64) * 86400 + 10 ** 9
          for _ in range(50)]
    fb, ib = encode_float_streams(fl), encode_int_streams(it)
    for blob, batched in zip(fb, decode_float_streams(fb)):
        np.testing.assert_array_equal(
            decode_values(blob).view(np.uint64), batched.view(np.uint64))
    for blob, batched in zip(ib, decode_int_streams(ib)):
        np.testing.assert_array_equal(decode_timestamps(blob), batched)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                                   width=64),
                         min_size=0, max_size=40),
                min_size=0, max_size=8))
def test_batched_float_decode_property(streams):
    """Hypothesis: batched decode inverts batched encode bit-for-bit on
    arbitrary float64 payloads (NaN payloads compared as bit patterns)."""
    arrs = [np.asarray(s, dtype=np.float64) for s in streams]
    blobs = g.encode_float_streams(arrs)
    for a, b in zip(arrs, g.decode_float_streams(blobs)):
        np.testing.assert_array_equal(a.view(np.uint64), b.view(np.uint64))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                         min_size=0, max_size=40),
                min_size=0, max_size=8))
def test_batched_int_decode_property(streams):
    arrs = [np.asarray(s, dtype=np.int64) for s in streams]
    blobs = g.encode_int_streams(arrs)
    for a, b in zip(arrs, g.decode_int_streams(blobs)):
        np.testing.assert_array_equal(a, b)
