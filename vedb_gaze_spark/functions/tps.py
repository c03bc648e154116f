"""Pure-numpy thin-plate spline (no scipy/thinplate in this container).

Standard 2-D TPS formulation (Bookstein 1989; same math the reference
pulls from the py-thin-plate-spline package in calibration.py:7 and
error_computation.py:8): radial kernel U(r) = r^2 log(r), polynomial part
[1, x, y], regularization lambda on the kernel diagonal.

Used ONLY inside applyInPandas groups (one calibration epoch / one user),
which are bounded by construction — the cluster-median reduction upstream
(marker_parsing.py:261 marker_cluster_stat) keeps n small no matter how
much raw data the cluster holds.
"""

from __future__ import annotations

import numpy as np


def _u(r2: np.ndarray) -> np.ndarray:
    """U(r) = r^2 log(r) = 0.5 * r^2 log(r^2), with U(0) = 0."""
    out = np.zeros_like(r2)
    nz = r2 > 0
    out[nz] = 0.5 * r2[nz] * np.log(r2[nz])
    return out


def tps_fit(xy: np.ndarray, v: np.ndarray, lambd: float) -> np.ndarray:
    """Fit TPS weights for values v at control points xy (n x 2).

    Returns the (n+3,) parameter vector [w, a0, ax, ay].
    """
    n = len(xy)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    K = _u(d2) + lambd * np.eye(n)
    Pm = np.hstack([np.ones((n, 1)), xy])
    A = np.zeros((n + 3, n + 3))
    A[:n, :n] = K
    A[:n, n:] = Pm
    A[n:, :n] = Pm.T
    b = np.concatenate([v, np.zeros(3)])
    return np.linalg.solve(A, b)


def tps_eval(xy_new: np.ndarray, xy: np.ndarray, theta: np.ndarray) -> np.ndarray:
    """Evaluate a fitted TPS at new points (m x 2)."""
    n = len(xy)
    w, a = theta[:n], theta[n:]
    d2 = ((xy_new[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    return _u(d2) @ w + a[0] + xy_new @ a[1:]


def tps_fit_cv(
    xy: np.ndarray, v: np.ndarray, lambdas: np.ndarray
) -> tuple[float, float]:
    """Leave-one-out cross-validation over a lambda grid, exactly the
    reference's _fit_tps_gaze_cv loop (calibration.py:350): refit with one
    point held out, score RMSE of held-out predictions, pick the best
    lambda. Returns (best_lambda, best_cv_rmse)."""
    n = len(xy)
    errs = np.zeros(len(lambdas))
    for li, lam in enumerate(lambdas):
        pred = np.zeros(n)
        for i in range(n):
            keep = np.ones(n, dtype=bool)
            keep[i] = False
            theta = tps_fit(xy[keep], v[keep], lam)
            pred[i] = tps_eval(xy[i : i + 1], xy[keep], theta)[0]
        errs[li] = float(np.sqrt(np.mean((pred - v) ** 2)))
    best = int(np.argmin(errs))
    return float(lambdas[best]), float(errs[best])
