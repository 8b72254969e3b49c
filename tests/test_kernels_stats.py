"""Stats kernel tests, mirroring /root/reference/tests/unit_tests/test_stats.py."""

from __future__ import annotations

import numpy as np
import pytest

from nrt_spark.kernels import stats as st


@pytest.mark.parametrize("x", [-1.0, 1.0, 0.3])
def test_ncdf_vs_erfc(x):
    # exact normal CDF via math.erfc as the oracle
    import math

    exact = 0.5 * math.erfc(-x / math.sqrt(2))
    np.testing.assert_allclose(st.ncdf(x), exact, rtol=1e-6)


def test_nan_percentile():
    rng = np.random.RandomState(7)
    data = rng.random_sample((20, 40))
    data[rng.random_sample((20, 40)) < 0.1] = np.nan
    got = st.nan_percentile_axis0(data, np.array([75, 25]))
    want = np.nanpercentile(data, [75, 25], 0)
    np.testing.assert_allclose(got, want)


def test_nanlstsq_matches_per_series_solve():
    rng = np.random.RandomState(3)
    X = np.c_[np.ones(50), np.arange(50, dtype=float)]
    y = 3.0 + 0.5 * X[:, 1:2] + rng.normal(size=(50, 6))
    y[rng.random_sample(y.shape) < 0.15] = np.nan
    beta = st.nanlstsq(X, y)
    for k in range(y.shape[1]):
        keep = ~np.isnan(y[:, k])
        Xs, ys = X[keep], y[keep, k]
        want = np.linalg.solve(Xs.T @ Xs, Xs.T @ ys)
        np.testing.assert_allclose(beta[:, k], want, rtol=1e-10)


def test_mad_bisquare():
    r = np.array([1.0, -2.0, 3.0, np.nan, 0.5])
    assert st.mad(r) == pytest.approx(
        np.nanmedian(np.abs(r - np.nanmedian(r))) / 0.6745)
    w = st.bisquare(np.array([0.0, 4.685, 10.0, -1.0]))
    assert w[0] == 1.0 and w[1] == 0.0 and w[2] == 0.0 and 0 < w[3] < 1
