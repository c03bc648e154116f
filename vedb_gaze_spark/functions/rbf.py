"""Pure-numpy RBF interpolation with LOO CV over kernel families
(no scipy in this container).

Re-expresses the math of the reference's ``_fit_rbf_cv``
(calibration.py:239): scipy.interpolate.Rbf builds the kernel system
(A − smooth·I)·w = z and cross-validates leave-one-out over a
(smoothness × method) grid, refitting n times per cell. Here the LOO
residuals come from the same closed form the TPS path uses
(functions/tps.py:52): deleting row/col i of the kernel system IS the
held-out system, so residual_i = w_i / (M⁻¹)_ii — one stacked inversion
per kernel family replaces n·|grid| refits.

Kernel definitions match scipy's (multiquadric sqrt((r/ε)²+1), linear r,
cubic r³, thin-plate r²log r); ε is the mean pairwise distance (scipy's
default is a bounding-box measure — documented deviation, same order).
Used only inside bounded applyInPandas groups (cluster medians).
"""

from __future__ import annotations

import numpy as np

METHODS = ("thin-plate", "multiquadric", "linear", "cubic")
# the reference's smoothness grid, verbatim (calibration.py:240)
SMOOTHNESSES = np.linspace(-0.001, 10, 100)


def _kernel(r: np.ndarray, method: str, eps: float) -> np.ndarray:
    if method == "multiquadric":
        return np.sqrt((r / eps) ** 2 + 1.0)
    if method == "linear":
        return r
    if method == "cubic":
        return r**3
    if method == "thin-plate":
        out = np.zeros_like(r)
        nz = r > 0
        out[nz] = r[nz] ** 2 * np.log(r[nz])
        return out
    raise ValueError(method)


def rbf_cv(
    xy: np.ndarray,
    V: np.ndarray,
    methods: tuple[str, ...] = METHODS,
    smoothnesses: np.ndarray = SMOOTHNESSES,
) -> tuple[str, float, float, float]:
    """LOO CV over (smoothness, method); returns (best_method,
    best_smoothness, cv_rmse, train_rmse). Error is the reference's
    pooled RMS over points AND both targets; the argmin tie-break is the
    reference's np.unravel_index row-major order (smoothness-major)."""
    n = len(xy)
    D = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    iu = np.triu_indices(n, 1)
    eps = float(D[iu].mean()) if len(iu[0]) else 1.0
    S = len(smoothnesses)
    idx = np.arange(n)
    errs = np.full((S, len(methods)), np.inf)
    solves: dict[int, np.ndarray] = {}
    for mi, method in enumerate(methods):
        K = _kernel(D, method, eps)
        M = np.broadcast_to(K, (S, n, n)).copy()
        M[:, idx, idx] -= np.asarray(smoothnesses)[:, None]
        try:
            Minv = np.linalg.inv(M)
        except np.linalg.LinAlgError:
            continue
        W = Minv @ V  # (S, n, 2)
        diag = Minv[:, idx, idx]
        resid = W / diag[:, :, None]
        e = np.sqrt(np.mean(resid**2, axis=(1, 2)))
        e = np.where(np.isfinite(e), e, np.inf)
        errs[:, mi] = e
        solves[mi] = W
    si, mi = np.unravel_index(int(np.argmin(errs)), errs.shape)
    if mi not in solves or not np.isfinite(errs[si, mi]):
        # every family's stacked inversion failed (or produced no finite
        # residual): np.argmin over all-inf returns (0,0), which would
        # KeyError into solves — return an explicit failure sentinel the
        # caller can gate on instead.
        return "none", float("nan"), float("inf"), float("inf")
    best_method = methods[mi]
    best_smooth = float(smoothnesses[si])
    cv_rmse = float(errs[si, mi])
    K = _kernel(D, best_method, eps)
    train_pred = K @ solves[mi][si]
    train_rmse = float(np.sqrt(np.mean((train_pred - V) ** 2)))
    return best_method, best_smooth, cv_rmse, train_rmse
