"""Scipy-free Delaunay triangulation + scattered interpolation.

Public-algorithm implementation (Bowyer 1981 / Watson 1981 incremental
insertion; barycentric evaluation per Preparata & Shamos) backing
``error_surface_grid`` — the ``scipy.interpolate.griddata`` role in the
reference's ``compute_error(method='griddata')``
(vedb_gaze/error_computation.py:165-166): interpolate a scattered error
field onto a regular grid, NaN outside the points' convex hull. Two
variants share the triangulation and hull/containment logic:

- ``interp_linear`` — griddata(method='linear'): simplex-local
  barycentric blend, C⁰. Exact and triangulation-independent on affine
  fields, which is what several pytest pins exploit.
- ``interp_cubic`` — griddata(method='cubic'): the C¹ Clough-Tocher
  cubic the reference actually calls, built from scratch (r13; see the
  section comment below for the construction and its provenance).

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


# --- C¹ cubic (Clough-Tocher) -------------------------------------------
#
# The reference's griddata call is method='cubic'
# (vedb_gaze/error_computation.py:165) — scipy's
# CloughTocher2DInterpolator: a piecewise-cubic C¹ Bézier patch per
# Delaunay triangle (Clough & Tocher 1965; Farin, "Triangular
# Bernstein-Bézier patches", CAGD 1986), with vertex gradients
# estimated by minimizing Nielson's minimum-norm-network energy
# (Nielson, Math. Comp. 1983) — the global curvature-like functional
# scipy's estimate_gradients_2d_global iterates on. Everything below is
# implemented from those published constructions; nothing is
# transcribed.


def estimate_gradients(
    pts: np.ndarray, vals: np.ndarray, tris: list | None = None
) -> np.ndarray:
    """Vertex gradients minimizing the minimum-norm-network energy: sum
    over triangulation edges of the 1-D cubic bending energy
    ∫|f''|² = 4/L³·(3Δ² − 3Δ(d_i+d_j)L + L²(d_i²+d_i d_j+d_j²)), with
    d_i = g_i·ê the end slopes along the edge. Stationarity in every
    g_i is a symmetric positive (semi-)definite 2n×2n linear system —
    per edge (i, j): (8/L)ûûᵀ into block (i,i), (4/L)ûûᵀ into (i,j),
    and 12Δ/L²·û into the rhs of i. One dense lstsq solves it EXACTLY
    (point sets here are cluster-reduced, tens of vertices); the
    iterative Gauss-Seidel scheme in the literature converges to the
    same stationary point, so this is the same estimate without the
    iteration-count/tolerance knobs. Exact for affine fields (zero
    energy at the true constant gradient)."""
    pts = np.asarray(pts, dtype=np.float64)
    vals = np.asarray(vals, dtype=np.float64)
    n = len(pts)
    if tris is None:
        tris = delaunay(pts)
    edges = set()
    for a, b, c in tris:
        edges.add((min(a, b), max(a, b)))
        edges.add((min(b, c), max(b, c)))
        edges.add((min(c, a), max(c, a)))
    A = np.zeros((2 * n, 2 * n))
    rhs = np.zeros(2 * n)
    # effectively-coincident vertices (position dedup keeps points one
    # ulp apart as distinct) would put 1/L³ ~ 1e48 edge weights into
    # the system and blow the solved gradients to ~1e16; such an edge
    # carries no usable directional information, so drop it
    span = float(np.ptp(pts, axis=0).max()) or 1.0
    min_len = 1e-9 * span
    for i, j in sorted(edges):
        e = pts[j] - pts[i]
        L = float(np.hypot(e[0], e[1]))
        if L < min_len:
            continue
        u = e / L
        uu = np.outer(u, u)
        d = vals[j] - vals[i]
        for a, b in ((i, j), (j, i)):
            A[2 * a : 2 * a + 2, 2 * a : 2 * a + 2] += (8.0 / L) * uu
            A[2 * a : 2 * a + 2, 2 * b : 2 * b + 2] += (4.0 / L) * uu
        # the rhs is the SAME for both endpoints: seen from j, the edge
        # vector and Δ both flip sign, cancelling
        rhs[2 * i : 2 * i + 2] += (12.0 * d / L**2) * u
        rhs[2 * j : 2 * j + 2] += (12.0 * d / L**2) * u
    # lstsq: a vertex whose incident edges are all parallel leaves its
    # transversal gradient component unconstrained (zero is returned)
    g, *_ = np.linalg.lstsq(A, rhs, rcond=None)
    return g.reshape(n, 2)


def _ct_ordinates(p1, p2, p3, f, g):
    """The 3×10 Bézier ordinate net of one Clough-Tocher macro triangle
    (vertices p1..p3, values f[0..2], gradients g[0..2]), split at the
    centroid. Micro triangle k has apex p4=centroid and outer edge
    (V_{k+1}, V_{k+2}) (indices mod 3); its ordinates are returned in
    the order (c300, c210, c201, c120, c111, c102, c030, c021, c012,
    c003) with barycentric (apex, i, j).

    Construction (all classical):
    - corner + edge ordinates from values/gradients (cubic Hermite
      data along each edge);
    - the (1,1,1) ordinate from the C¹ cross-edge condition: the
      directional derivative along the OUTER edge's normal must vary
      linearly along the edge — with the Bernstein form
      D_w f(t) = 3[(1−t)²A0 + 2t(1−t)A1 + t²A2] this is
      A1 = (A0+A2)/2, solved for c111 (both macro triangles sharing
      the edge use the edge normal, so the condition glues them C¹;
      like the classical element — and unlike an affine-invariant
      variant — very thin triangles can overshoot);
    - the internal-edge ordinates d_k adjacent to the centroid from
      the C¹ condition across internal edges (the transversal vertex
      has barycentric (3, −1, −1) w.r.t. the neighboring micro
      triangle when the split point is the centroid), which reduces to
      d_k = (c111^{left} + c111^{right} + q_k)/3 with
      q_k = f_k + g_k·(p4−V_k)/3;
    - the apex ordinate b4 = (d1+d2+d3)/3 (C¹ at the split point)."""
    P = (np.asarray(p1, float), np.asarray(p2, float), np.asarray(p3, float))
    p4 = (P[0] + P[1] + P[2]) / 3.0
    q = [f[k] + (g[k] @ (p4 - P[k])) / 3.0 for k in range(3)]
    # outer-edge data + c111 per micro triangle k: edge (i, j)
    micro = []
    c111s = []
    for k in range(3):
        i, j = (k + 1) % 3, (k + 2) % 3
        vi, vj = P[i], P[j]
        c030 = f[i]
        c003 = f[j]
        c021 = f[i] + (g[i] @ (vj - vi)) / 3.0
        c012 = f[j] + (g[j] @ (vi - vj)) / 3.0
        c120 = q[i]
        c102 = q[j]
        # barycentric direction of the edge normal w.r.t. (p4, vi, vj)
        # in closed form: for w = perp(vj - vi) the apex component is
        # δ4 = |e|²/den2 (den2 = doubled signed area of the micro
        # triangle), never zero unless the micro triangle is flat —
        # in which case the caller must not use this net
        e = vj - vi
        w = np.array([-e[1], e[0]])
        den2 = (vi[1] - vj[1]) * (p4[0] - vj[0]) + (vj[0] - vi[0]) * (
            p4[1] - vj[1]
        )
        if den2 == 0.0:
            return None
        d4 = ((vi[1] - vj[1]) * w[0] + (vj[0] - vi[0]) * w[1]) / den2
        di = ((vj[1] - p4[1]) * w[0] + (p4[0] - vj[0]) * w[1]) / den2
        dj = -d4 - di
        a0 = d4 * c120 + di * c030 + dj * c021
        a2 = d4 * c102 + di * c012 + dj * c003
        c111 = ((a0 + a2) / 2.0 - di * c021 - dj * c012) / d4
        c111s.append(c111)
        micro.append([c030, c003, c021, c012, c120, c102, c111])
    # internal-edge ordinates: edge p4-V_k is shared by micro triangles
    # k+1 (where V_k is vertex j) and k+2 (where V_k is vertex i)
    d = [
        (c111s[(k + 1) % 3] + c111s[(k + 2) % 3] + q[k]) / 3.0
        for k in range(3)
    ]
    b4 = (d[0] + d[1] + d[2]) / 3.0
    out = np.empty((3, 10))
    for k in range(3):
        i, j = (k + 1) % 3, (k + 2) % 3
        c030, c003, c021, c012, c120, c102, c111 = micro[k]
        # (c300, c210, c201) = (b4, d_i, d_j): the apex ring lies on
        # the internal edges toward V_i and V_j
        out[k] = (b4, d[i], d[j], c120, c111, c102, c030, c021, c012, c003)
    return out


def interp_cubic(
    pts: np.ndarray,
    vals: np.ndarray,
    qs: np.ndarray,
    grads: np.ndarray | None = None,
) -> np.ndarray:
    """griddata(method='cubic') semantics: piecewise-cubic C¹
    Clough-Tocher surface over the Delaunay triangulation, NaN outside
    the convex hull — the same hull/containment logic as interp_linear
    (hull parity is pinned), with estimate_gradients supplying vertex
    gradients when ``grads`` is None. Exact on quadratic fields when
    exact gradients are passed; exact on affine fields even with
    estimated gradients (the energy minimum recovers the true constant
    gradient)."""
    pts = np.asarray(pts, dtype=np.float64)
    vals = np.asarray(vals, dtype=np.float64)
    qs = np.asarray(qs, dtype=np.float64)
    out = np.full(len(qs), np.nan)
    tris = delaunay(pts)
    if not tris:
        return out
    if grads is None:
        grads = estimate_gradients(pts, vals, tris)
    grads = np.asarray(grads, dtype=np.float64)
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
    # ordinate nets once per triangle (tens of triangles per group);
    # near-zero-area slivers (the degenerate-cavity fallback in
    # delaunay, or triangles whose MICRO area underflows even though
    # the macro `den` is nonzero) return no net and are excluded from
    # containment entirely — a query on such a sliver resolves through
    # whichever valid triangle also contains it, or stays NaN
    nets = np.zeros((len(tris), 3, 10))
    net_ok = np.zeros(len(tris), dtype=bool)
    for idx, t in enumerate(tris):
        if ok[idx]:
            net = _ct_ordinates(
                pts[t[0]], pts[t[1]], pts[t[2]],
                vals[list(t)], grads[list(t)],
            )
            if net is not None:
                nets[idx] = net
                net_ok[idx] = True
    inside = (
        (w1 >= -1e-9) & (w2 >= -1e-9) & (w3 >= -1e-9) & net_ok[:, None]
    )
    hit = inside.any(axis=0)
    if not hit.any():
        return out
    first = inside.argmax(axis=0)
    qi = np.nonzero(hit)[0]
    ti = first[qi]
    # macro barycentric of each hit query w.r.t. ITS triangle,
    # clamped against the containment tolerance so micro-selection
    # and Bernstein weights stay in-simplex
    bc = np.stack([w1[ti, qi], w2[ti, qi], w3[ti, qi]], axis=1)
    bc = np.clip(bc, 0.0, None)
    bc /= bc.sum(axis=1, keepdims=True)
    # micro triangle k (outer edge (k+1, k+2)) contains the query
    # where b_k is the minimum; micro barycentric (apex, i, j) =
    # (3·b_k, b_i − b_k, b_j − b_k)
    k = np.argmin(bc, axis=1)
    i, j = (k + 1) % 3, (k + 2) % 3
    r = np.arange(len(qi))
    u = 3.0 * bc[r, k]
    s = bc[r, i] - bc[r, k]
    t = bc[r, j] - bc[r, k]
    c = nets[ti, k]  # (hits, 10)
    val = (
        c[:, 0] * u**3
        + 3.0 * c[:, 1] * u**2 * s
        + 3.0 * c[:, 2] * u**2 * t
        + 3.0 * c[:, 3] * u * s**2
        + 6.0 * c[:, 4] * u * s * t
        + 3.0 * c[:, 5] * u * t**2
        + c[:, 6] * s**3
        + 3.0 * c[:, 7] * s**2 * t
        + 3.0 * c[:, 8] * s * t**2
        + c[:, 9] * t**3
    )
    out[qi] = val
    return out
