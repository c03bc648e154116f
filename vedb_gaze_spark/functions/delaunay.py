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


def _circumcircle(a, b, c):
    """Circumcenter + squared radius of triangle (a, b, c), or None for
    a degenerate (collinear) triangle. Computed ONCE per triangle at
    creation so the hot in-circle test is three float ops — the
    np.linalg.det-per-test form paid ~25× in per-test overhead
    (measured 7.3 µs array-build + det vs 0.3 µs float compare,
    PERF_NOTES r12)."""
    ax, ay = float(a[0]), float(a[1])
    bx, by = float(b[0]), float(b[1])
    cx, cy = float(c[0]), float(c[1])
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return None
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


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
    # each entry: (i, j, k, circumcenter_x, circumcenter_y, r², valid)
    first = _circumcircle(P[n], P[n + 1], P[n + 2])
    tris: list[tuple] = [(n, n + 1, n + 2, *first)]
    eps = 1e-12 * max(1.0, span * span)
    for idx in order:
        px, py = float(P[idx][0]), float(P[idx][1])
        bad = [
            t
            for t in tris
            if (px - t[3]) ** 2 + (py - t[4]) ** 2 < t[5] - eps
        ]
        if not bad:
            # strictly-on-circle / degenerate case: fall back to the
            # containing triangle so insertion always proceeds
            for t in tris:
                if _bary(P[t[0]], P[t[1]], P[t[2]], (px, py)) is not None:
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
                cc = _circumcircle(P[a], P[b], (px, py))
                if cc is None:
                    # collinear cavity edge with the new point: a
                    # zero-area triangle would never contain anything;
                    # keep it with an empty circle so the mesh stays
                    # consistent for later cavity walks
                    cc = (px, py, 0.0)
                tris.append((a, b, int(idx), *cc))
    return [(t[0], t[1], t[2]) for t in tris if max(t[:3]) < n]


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
    if not tris:
        return out
    # one broadcasted barycentric solve over all (triangle, query)
    # pairs — the per-triangle loop paid ~10 numpy calls per triangle
    # on tiny arrays (PERF_NOTES r12)
    T = np.asarray(tris, dtype=np.int64)
    A, B, C = pts[T[:, 0]], pts[T[:, 1]], pts[T[:, 2]]
    den = (B[:, 1] - C[:, 1]) * (A[:, 0] - C[:, 0]) + (
        C[:, 0] - B[:, 0]
    ) * (A[:, 1] - C[:, 1])
    ok = den != 0.0
    den = np.where(ok, den, 1.0)
    dx = qs[None, :, 0] - C[:, None, 0]  # (T, Q)
    dy = qs[None, :, 1] - C[:, None, 1]
    w1 = (
        (B[:, 1] - C[:, 1])[:, None] * dx
        + (C[:, 0] - B[:, 0])[:, None] * dy
    ) / den[:, None]
    w2 = (
        (C[:, 1] - A[:, 1])[:, None] * dx
        + (A[:, 0] - C[:, 0])[:, None] * dy
    ) / den[:, None]
    w3 = 1.0 - w1 - w2
    inside = (
        (w1 >= -1e-9) & (w2 >= -1e-9) & (w3 >= -1e-9) & ok[:, None]
    )
    # first containing triangle per query (shared-edge queries are
    # well-defined: the interpolant is continuous across simplices)
    hit = inside.any(axis=0)
    first = inside.argmax(axis=0)
    v = (
        w1 * vals[T[:, 0]][:, None]
        + w2 * vals[T[:, 1]][:, None]
        + w3 * vals[T[:, 2]][:, None]
    )
    out[hit] = v[first[hit], np.nonzero(hit)[0]]
    return out
