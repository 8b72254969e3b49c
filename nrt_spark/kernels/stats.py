"""Low-level statistics kernels (NaN-aware, vectorized over series).

Numeric semantics match the reference (``/root/reference/nrt/stats.py``)
but the implementations are plain numpy (no numba): Spark tasks provide
the outer parallelism, so per-batch numpy/BLAS is the right granularity.
"""

from __future__ import annotations

import numpy as np


def nanlstsq(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Least-squares solution per series, skipping NaN observations.

    Solves the normal equations ``(X_s' X_s) b = X_s' y_s`` per series s,
    where rows with NaN in that series are dropped (reference
    ``nrt/stats.py:20-68``).  Series sharing the same NaN pattern are
    batched into a single multi-RHS solve.

    Args:
        X: (M, N) design matrix.
        y: (M, K) matrix of dependent variables (NaN = missing).

    Returns:
        (N, K) float64 array of coefficients.
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    M, K = y.shape
    beta = np.zeros((X.shape[1], K), dtype=np.float64)
    isna = np.isnan(y)
    if not isna.any():
        # One factorization, K right-hand sides.
        beta[:] = np.linalg.solve(X.T @ X, X.T @ y)
        return beta
    # Group series by identical NaN pattern so each distinct pattern costs
    # one factorization (most real batches have few distinct gap patterns).
    pattern_ids = {}
    groups: dict[int, list[int]] = {}
    for k in range(K):
        key = isna[:, k].tobytes()
        gid = pattern_ids.setdefault(key, len(pattern_ids))
        groups.setdefault(gid, []).append(k)
    for key, gid in pattern_ids.items():
        cols = groups[gid]
        keep = ~np.frombuffer(key, dtype=bool)
        Xs = X[keep]
        ys = y[np.ix_(keep, cols)]
        beta[:, cols] = np.linalg.solve(Xs.T @ Xs, Xs.T @ ys)
    return beta


def mad(resid: np.ndarray, c: float = 0.6745) -> float:
    """Median absolute deviation scale estimate (reference ``nrt/stats.py:71-86``)."""
    return np.nanmedian(np.fabs(resid - np.nanmedian(resid))) / c


def bisquare(resid: np.ndarray, c: float = 4.685) -> np.ndarray:
    """Tukey biweight: w = (1-(r/c)^2)^2 where |r|<c else 0 (``nrt/stats.py:89-104``)."""
    return (np.abs(resid) < c) * (1 - (resid / c) ** 2) ** 2


def erfcc(x: float) -> float:
    """Complementary error function, Numerical-Recipes rational approximation
    (same constants as reference ``nrt/stats.py:107-118``)."""
    z = np.abs(x)
    t = 1.0 / (1.0 + 0.5 * z)
    r = t * np.exp(
        -z * z - 1.26551223 + t * (1.00002368 + t * (0.37409196 + t * (
            0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (
                -1.13520398 + t * (1.48851587 + t * (-0.82215223 + t * 0.17087277))))))))
    )
    return r if x >= 0.0 else 2.0 - r


def ncdf(x: float) -> float:
    """Standard normal CDF via ``erfcc`` (reference ``nrt/stats.py:121-127``)."""
    return 1.0 - 0.5 * erfcc(x / (2.0 ** 0.5))


def nan_percentile_axis0(arr: np.ndarray, percentiles) -> np.ndarray:
    """``np.nanpercentile(arr, percentiles, axis=0)`` with the same linear
    interpolation the reference uses (``nrt/stats.py:131-154``)."""
    return np.nanpercentile(arr, np.asarray(percentiles), axis=0)
