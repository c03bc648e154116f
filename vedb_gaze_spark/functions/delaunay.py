"""Scipy-free Delaunay triangulation + barycentric linear interpolation.

Public-algorithm implementation (Bowyer 1981 / Watson 1981 incremental
insertion; barycentric evaluation per Preparata & Shamos) backing
``error_surface_grid`` — the ``scipy.interpolate.griddata`` role in the
reference's ``compute_error(method='griddata')``
(vedb_gaze/error_computation.py:165-166): interpolate a scattered error
field onto a regular grid, NaN outside the points' convex hull. The
reference calls scipy's cubic (CloughTocher) variant; this module ships
the LINEAR variant — the same hull-bounded scattered-interpolation
semantics with a simplex-local linear model — because the container has
no scipy and a from-scratch C¹ Clough-Tocher adds nothing the QC
numbers (weighted error + interpolated-gaze fraction, :210-213) can
see. For affine fields the linear interpolant is exact and
triangulation-independent, which is what the pytest pins exploit.

Determinism: points are inserted in lexicographic (x, y) order and the
cavity boundary is re-triangulated in sorted-edge order, so the same
point set yields the same triangulation on every run and partition
layout. Degenerate (cocircular) configurations resolve by insertion
order — any valid triangulation supports the same continuous linear
interpolant along shared edges, so ties cannot change interpolated
values discontinuously.

Scale note: this runs per-GROUP inside applyInPandas on cluster-reduced
point sets (tens of points per user) — O(n²) insertion is irrelevant at
that size and the module never sees corpus-scale data.
"""

from __future__ import annotations

import numpy as np


def _in_circumcircle(a, b, c, p, eps: float = 1e-12) -> bool:
    """True iff p lies strictly inside the circumcircle of (a, b, c).
    Sign is orientation-corrected so callers need not order vertices."""
    m = np.array(
        [
            [a[0] - p[0], a[1] - p[1], (a[0] - p[0]) ** 2 + (a[1] - p[1]) ** 2],
            [b[0] - p[0], b[1] - p[1], (b[0] - p[0]) ** 2 + (b[1] - p[1]) ** 2],
            [c[0] - p[0], c[1] - p[1], (c[0] - p[0]) ** 2 + (c[1] - p[1]) ** 2],
        ]
    )
    det = float(np.linalg.det(m))
    orient = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    if orient < 0:
        det = -det
    return det > eps


def delaunay(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson incremental Delaunay over (n, 2) float64 points.
    Returns vertex-index triples. Requires deduplicated points; n < 3
    or fully collinear inputs return []. Deterministic (see module
    docstring)."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    mn, mx = pts.min(axis=0), pts.max(axis=0)
    ctr = (mn + mx) / 2.0
    span = float(max(mx[0] - mn[0], mx[1] - mn[1])) or 1.0
    big = 64.0 * span
    sup = np.array(
        [
            [ctr[0] - big, ctr[1] - big],
            [ctr[0] + big, ctr[1] - big],
            [ctr[0], ctr[1] + big],
        ]
    )
    P = np.vstack([pts, sup])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    for idx in order:
        p = P[idx]
        bad = [
            t
            for t in tris
            if _in_circumcircle(P[t[0]], P[t[1]], P[t[2]], p)
        ]
        if not bad:
            # strictly-on-circle / degenerate case: fall back to the
            # containing triangle so insertion always proceeds
            for t in tris:
                if _bary(P[t[0]], P[t[1]], P[t[2]], p) is not None:
                    bad = [t]
                    break
            if not bad:
                continue  # duplicate / pathological point: skip
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        for t in bad:
            tris.remove(t)
        for (a, b), cnt in sorted(edge_count.items()):
            if cnt == 1:
                tris.append((a, b, int(idx)))
    return [t for t in tris if max(t) < n]


def _bary(a, b, c, q, eps: float = 1e-9):
    """Barycentric coordinates of q in triangle (a, b, c), or None if
    outside (tolerance eps) or the triangle is degenerate."""
    den = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
    if den == 0.0:
        return None
    w1 = ((b[1] - c[1]) * (q[0] - c[0]) + (c[0] - b[0]) * (q[1] - c[1])) / den
    w2 = ((c[1] - a[1]) * (q[0] - c[0]) + (a[0] - c[0]) * (q[1] - c[1])) / den
    w3 = 1.0 - w1 - w2
    if w1 < -eps or w2 < -eps or w3 < -eps:
        return None
    return w1, w2, w3


def interp_linear(
    pts: np.ndarray, vals: np.ndarray, qs: np.ndarray
) -> np.ndarray:
    """griddata(method='linear') semantics: value at each query point is
    the barycentric-linear blend over its containing Delaunay simplex;
    NaN outside the convex hull. Shared-edge queries are well-defined
    (the interpolant is continuous across simplices)."""
    pts = np.asarray(pts, dtype=np.float64)
    vals = np.asarray(vals, dtype=np.float64)
    qs = np.asarray(qs, dtype=np.float64)
    out = np.full(len(qs), np.nan)
    tris = delaunay(pts)
    for (i, j, k) in tris:
        a, b, c = pts[i], pts[j], pts[k]
        den = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if den == 0.0:
            continue
        w1 = (
            (b[1] - c[1]) * (qs[:, 0] - c[0])
            + (c[0] - b[0]) * (qs[:, 1] - c[1])
        ) / den
        w2 = (
            (c[1] - a[1]) * (qs[:, 0] - c[0])
            + (a[0] - c[0]) * (qs[:, 1] - c[1])
        ) / den
        w3 = 1.0 - w1 - w2
        inside = (
            (w1 >= -1e-9) & (w2 >= -1e-9) & (w3 >= -1e-9) & np.isnan(out)
        )
        if inside.any():
            out[inside] = (
                w1[inside] * vals[i]
                + w2[inside] * vals[j]
                + w3[inside] * vals[k]
            )
    return out
