"""Parity tests for fit kernels (RIRLS vs statsmodels golden, CCDC-stable
stability flags, ROC smoke), mirroring
/root/reference/tests/unit_tests/test_fit_methods.py."""

from __future__ import annotations

import numpy as np
import pytest

from nrt_spark.kernels import fit as fm

# statsmodels RLM(TukeyBiweight) golden betas for the RLM_{X,y}.csv fixture
# (reference tests/unit_tests/conftest.py:183-192)
SM_RLM_GOLDEN = np.array([
    [2.3757569983999076, -51.621207292381314],
    [1.5919053949452396e-05, -0.00019788972214892546],
    [4.960483948314601, -73.95341088849317],
    [4.0427485592574195, -17.66452192456504],
    [1.0676653146683237, 0.579422996703399],
    [-0.7172424822211365, -49.52111301879781],
    [1.2701246101474761, -38.324020145702654],
    [1.1329168669944791, -9.034638787625045],
])


def test_rirls_golden(ref_data_dir):
    X = np.loadtxt(ref_data_dir / "RLM_X.csv", delimiter=",", dtype=np.float64)
    y = np.loadtxt(ref_data_dir / "RLM_y.csv", delimiter=",", dtype=np.float64)
    beta, _ = fm.rirls(X, y)
    np.testing.assert_allclose(beta, SM_RLM_GOLDEN, rtol=1e-2)


def _stability_fixture():
    # Mirrors the reference's constructed stability scenarios
    # (tests/unit_tests/conftest.py:47-70): big first resid, big last resid,
    # large slope, clean + one NaN -> expected [True, False, False, True].
    rng = np.random.RandomState(0)
    n = 30
    residuals = (rng.rand(n, 4) - 0.5) * 2
    residuals[0, 0] = 100
    residuals[-1, 1] = 100
    ts = np.array([
        np.ones(n),
        np.ones(n),
        np.arange(n) * 20 + 5,
        np.ones(n),
    ]).T
    ts[n // 2, 3] = np.nan
    X = np.array([np.ones(n), np.arange(n)]).T
    y = ts + residuals
    dates = np.linspace(1, 365, n)
    return X, y, dates, np.array([True, False, False, True])


def test_ccdc_stable_fit_flags():
    X, y, dates, expected = _stability_fixture()
    _, _, stable, _ = fm.ccdc_stable_fit(X, y, dates, threshold=3)
    np.testing.assert_array_equal(stable, expected)


def test_roc_stable_fit_smoke(romania):
    X, y, dates = romania
    days = dates.astype("datetime64[D]").astype("int64")
    beta, resid, is_stable, fit_start = fm.roc_stable_fit(
        X.astype(np.float64), y.astype(np.float64), days)
    assert beta.shape == (X.shape[1], y.shape[1])
    assert is_stable.dtype == bool


def test_ols_planted_outliers():
    # y = 2x + 5 with two planted outliers; OLS+Shewhart screen recovers them
    # (mirrors reference X_y_intercept_slope / test_outliers semantics).
    from nrt_spark.kernels.outliers import shewhart_screen

    X = np.c_[np.ones(10), np.arange(10)]
    y = np.array([2.0 * X[:, 1] + 5, 2.0 * X[:, 1] + 5]).T
    y[9, 0] = 0
    y[0, 1] = 23
    screened = shewhart_screen(X, y.copy(), L=2)
    assert np.isnan(screened[9, 0])
    assert np.isnan(screened[0, 1])
    # non-outlier positions preserved
    assert np.count_nonzero(np.isnan(screened)) == 2


def test_ccdc_rirls_screen_planted():
    # mirrors reference test_outliers.py:21-27: screen recovers exactly the
    # planted outliers when y doubles as green/swir.
    from nrt_spark.kernels.outliers import ccdc_rirls_screen

    X = np.c_[np.ones(10), np.arange(10)].astype(np.float64)
    y = np.array([2.0 * X[:, 1] + 5, 2.0 * X[:, 1] + 5]).T
    y[9, 0] = 0
    y[0, 1] = 23
    clear = np.ones_like(y, dtype=bool)
    clear[9, 0] = False
    clear[0, 1] = False
    screened = ccdc_rirls_screen(X=X, y=y.copy(), green=y.copy(), swir=y.copy())
    np.testing.assert_array_equal(~clear, np.isnan(screened))
