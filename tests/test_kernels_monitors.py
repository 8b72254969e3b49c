"""End-to-end monitor parity vs the reference's strucchange golden outputs
(process / boundary / histsize / sigma after fit on the first 100 obs and
monitoring the rest), mirroring
/root/reference/tests/unit_tests/test_utils_efp.py:102-157, plus
behavioral tests for EWMA/CCDC/IQR state machines."""

from __future__ import annotations

import numpy as np
import pytest

from nrt_spark.kernels import monitors as mon


def _fit_and_monitor(monitor_name, y, dates, **overrides):
    days = dates.astype("datetime64[D]").astype("int64")
    params = mon.resolve_params(monitor_name, **overrides)
    state = mon.fit_state(y[:100], days[:100], params)
    mon.run_monitor(state, y[100:], days[100:], params)
    return state


def test_cusum_golden(romania, ref_data_dir):
    X, y, dates = romania
    golden = np.loadtxt(ref_data_dir / "cusum_result.csv", delimiter=",")
    state = _fit_and_monitor("cusum", y, dates, trend=False, method="OLS")
    np.testing.assert_allclose(state["process"], golden[0], rtol=1e-4)
    np.testing.assert_allclose(state["boundary"], golden[1], rtol=1e-7)
    np.testing.assert_allclose(state["histsize"], golden[2])
    np.testing.assert_allclose(state["sigma"], golden[3], rtol=1e-6)


def test_mosum_golden(romania, ref_data_dir):
    X, y, dates = romania
    golden = np.loadtxt(ref_data_dir / "mosum_result.csv", delimiter=",")
    state = _fit_and_monitor("mosum", y, dates, trend=False, method="OLS")
    # Series 2 contains a confirmed break: bfast keeps monitoring, nrt halts,
    # so its process diverges (same exclusion as the reference test).
    np.testing.assert_allclose(np.delete(state["process"], 2),
                               np.delete(golden[0], 2), rtol=1e-4)
    np.testing.assert_allclose(state["boundary"], golden[1], rtol=1e-7)
    np.testing.assert_allclose(state["histsize"], golden[2])
    np.testing.assert_allclose(state["sigma"], golden[3], rtol=1e-6)


def _synthetic_batch(K=8, M=130, hist=100, seed=11):
    """Harmonic series batch with a planted level drop in half the series.

    The clean signal is generated *in the model space* (X @ beta_true with
    the engine's own regressors, trend-free) so pre-break residuals are
    pure iid noise, there is no trend-extrapolation bias for CUSUM to
    accumulate, and detection outcomes are deterministic."""
    rng = np.random.RandomState(seed)
    days = np.arange(M) * 5 + 16436  # 2015-01-01 onward, 5-day cadence
    from nrt_spark.kernels.regressors import regressors_for_days

    X = regressors_for_days(days, trend=False, harmonic_order=2)
    beta_true = np.array([0.5, 0.15, 0.03, 0.05, 0.01])
    y = (X @ beta_true)[:, None] + rng.normal(0, 0.02, size=(M, K))
    y[rng.random_sample((M, K)) < 0.08] = np.nan  # cloud gaps
    broken = np.arange(K) % 2 == 0
    # Break magnitude ~7.5 sigma: big enough for every monitor, small
    # enough to pass EWMA's 10-sigma extreme-outlier screen (ewma.py:86-88).
    y[hist + 5:, broken] -= 0.15
    return y, days, broken


MONITOR_TEST_OVERRIDES = {
    # default sensitivity=2 -> 2-sigma limits, ~5% false-alarm/step; use
    # 7-sigma limits for a deterministic no-false-alarm fixture
    "ewma": {"trend": False, "sensitivity": 7.0},
    # short synthetic history: OLS fit instead of ROC; trend-free fixture
    "cusum": {"method": "OLS", "trend": False},
    "mosum": {"method": "OLS", "trend": False},
    "ccdc": {"method": "OLS"},  # no green/swir bands in fixture
    "iqr": {"trend": False},
}


@pytest.mark.parametrize("monitor_name", ["ewma", "cusum", "mosum", "ccdc", "iqr"])
def test_break_detection(monitor_name):
    y, days, broken = _synthetic_batch()
    params = mon.resolve_params(monitor_name, **MONITOR_TEST_OVERRIDES[monitor_name])
    state = mon.fit_state(y[:100], days[:100], params)
    assert (state["mask"] == mon.MASK_MONITORED).all()
    mon.run_monitor(state, y[100:], days[100:], params)
    # all broken series detected, no false alarms
    detected = state["mask"] == mon.MASK_BREAK
    assert detected[broken].all(), f"{monitor_name}: missed breaks"
    assert not detected[~broken].any(), f"{monitor_name}: false alarms"
    assert (state["detection_date"][broken] > days[100]).all()


def test_ewma_extreme_outlier_screen():
    y, days, _ = _synthetic_batch(K=4)
    params = mon.resolve_params("ewma")
    state = mon.fit_state(y[:80], days[:80], params)
    p0 = state["process"].copy()
    # a wild outlier (>10 sigma) must NOT move the process
    obs = np.full(4, 50.0)
    mon.monitor_step(state, obs, int(days[80]), params)
    np.testing.assert_array_equal(state["process"], p0)
    assert (state["mask"] != mon.MASK_BREAK).all()


def test_nan_passthrough_keeps_state():
    y, days, _ = _synthetic_batch(K=4)
    for name in ("ewma", "cusum", "mosum", "ccdc", "iqr"):
        overrides = {"method": "OLS"} if name != "ewma" else {}
        params = mon.resolve_params(name, **overrides)
        state = mon.fit_state(y[:80], days[:80], params)
        p0 = np.array(state["process"], copy=True)
        n0 = np.array(state["n"], copy=True)
        mon.monitor_step(state, np.full(4, np.nan), int(days[80]), params)
        np.testing.assert_array_equal(state["process"], p0)
        np.testing.assert_array_equal(state["n"], n0)


def test_short_series_masked():
    y, days, _ = _synthetic_batch(K=6, M=100)
    y[:, 0] = np.nan
    y[5:, 1] = np.nan  # only 5 obs
    params = mon.resolve_params("iqr")
    state = mon.fit_state(y, days, params)
    assert state["mask"][0] == mon.MASK_TOO_SHORT
    assert state["mask"][1] == mon.MASK_TOO_SHORT
    assert (state["mask"][2:] == mon.MASK_MONITORED).all()


def test_halt_after_break():
    """Once mask=3 the series stops updating (reference F1/W6 semantics)."""
    y, days, broken = _synthetic_batch()
    params = mon.resolve_params("ewma")
    state = mon.fit_state(y[:80], days[:80], params)
    mon.run_monitor(state, y[80:100], days[80:100], params)
    det0 = state["detection_date"].copy()
    proc0 = state["process"].copy()
    mon.run_monitor(state, y[100:], days[100:], params)
    # detection dates of already-broken series unchanged
    already = state["mask"] == mon.MASK_BREAK
    np.testing.assert_array_equal(state["detection_date"][already & (det0 > 0)],
                                  det0[already & (det0 > 0)])
    np.testing.assert_array_equal(state["process"][det0 > 0], proc0[det0 > 0])


def test_update_mask_false_keeps_monitoring():
    """update_mask=False (reference __init__.py:100-104): boundary
    crossings neither flip mask to 3 nor stamp detection_date, and the
    process keeps updating past the crossing."""
    y, days, broken = _synthetic_batch()
    params = mon.resolve_params("ewma", **MONITOR_TEST_OVERRIDES["ewma"])
    state = mon.fit_state(y[:100], days[:100], params)
    mon.run_monitor(state, y[100:], days[100:], params, update_mask=False)
    assert (state["mask"] == mon.MASK_MONITORED).all()
    assert (state["detection_date"] == 0).all()
    # broken series' process reflects the post-break level (kept updating)
    assert (np.abs(state["process"][broken]) > state["boundary"][broken]).all()


def test_mosum_functional_and_period_overridable():
    """resolve_params exposes the reference crit-API knobs: the 'range'
    functional and other monitoring periods resolve to (larger) critical
    values, default stays the reference MoSum's (max, period=10)."""
    base = mon.resolve_params("mosum", trend=False, method="OLS")
    rng = mon.resolve_params("mosum", trend=False, method="OLS",
                             functional="range")
    short = mon.resolve_params("mosum", trend=False, method="OLS",
                               period=2)
    assert rng["critval"] > base["critval"]
    assert short["critval"] < base["critval"]
