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


def tps_cv_multi(
    xy: np.ndarray, V: np.ndarray, lambdas: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Leave-one-out CV over a lambda grid for k target columns at once —
    semantics of the reference's _fit_tps_gaze_cv loop (calibration.py:350:
    refit with one point held out, score RMSE of held-out predictions,
    pick the best lambda), computed in closed form.

    Deleting point i removes row/col i of the (n+3) system A(λ)θ = b,
    which IS the (n−1)-point TPS system (the held-out point leaves both
    the data and the kernel basis). Block-inversion of that deletion gives
    the held-out residual exactly: v_i − pred_i = x_i / (A(λ)⁻¹)_ii with
    x = A(λ)⁻¹b — so ONE stacked O(L·n³) inversion replaces L·n·k O(n³)
    refits, identical up to float roundoff (tests/test_numerics.py checks
    parity against the explicit loop). The per-call constant matters as
    much as the asymptotics here: groups are ~10 cluster medians, so the
    stacked LAPACK call amortizes numpy dispatch over all lambdas.

    Returns (best_lambda[k], best_cv_rmse[k], theta[(n+3), k] at each
    target's best lambda, train_pred[n, k]).
    """
    n = len(xy)
    L = len(lambdas)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    Pm = np.hstack([np.ones((n, 1)), xy])
    A0 = np.zeros((n + 3, n + 3))
    A0[:n, :n] = _u(d2)
    A0[:n, n:] = Pm
    A0[n:, :n] = Pm.T
    A = np.broadcast_to(A0, (L, n + 3, n + 3)).copy()
    idx = np.arange(n)
    A[:, idx, idx] += np.asarray(lambdas)[:, None]
    Ainv = np.linalg.inv(A)  # one stacked LAPACK call
    B = np.vstack([V, np.zeros((3, V.shape[1]))])
    X = Ainv @ B  # (L, n+3, k)
    diag = Ainv[:, idx, idx]  # (L, n)
    loo_resid = X[:, :n, :] / diag[:, :, None]
    errs = np.sqrt(np.mean(loo_resid**2, axis=1))  # (L, k)
    best = np.argmin(errs, axis=0)  # (k,)
    ks = np.arange(V.shape[1])
    theta = X[best, :, ks].T  # (n+3, k)
    train_pred = A0[:n, :] @ theta
    return (
        np.asarray(lambdas)[best].astype(float),
        errs[best, ks],
        theta,
        train_pred,
    )


def tps_fit_cv(
    xy: np.ndarray, v: np.ndarray, lambdas: np.ndarray
) -> tuple[float, float]:
    """Single-target LOO CV — thin wrapper over tps_cv_multi."""
    lam, err, _, _ = tps_cv_multi(xy, v[:, None], np.asarray(lambdas, dtype=float))
    return float(lam[0]), float(err[0])
