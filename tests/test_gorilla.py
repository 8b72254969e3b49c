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
