"""Edge-support pupil-ellipse refinement — pure numpy, no cv2.

The reference delegates pupil refinement to the Pupil Labs Detector2D
internals (pupil_detection_pl.py:11): after a coarse dark-region
proposal, Canny edges inside the region of interest are fit with an
ellipse and the detection's confidence is the fraction of the fitted
outline supported by edge pixels. Those internals are an unvendorable
C++ dependency, but every algorithm involved is public:

- Canny 1986 edge detection (Gaussian blur → Sobel gradients →
  non-maximum suppression → double-threshold hysteresis). The
  hysteresis step reuses the repo's linear-time run-labeling
  connected-components kernel (multimodal._label_components) — weak
  edge components survive iff they contain a strong pixel.
- Direct least-squares ellipse fitting, the numerically stable
  partitioned form (Fitzgibbon, Pilu & Fisher 1996; Halir & Flusser
  1998): one 3×3 eigen-decomposition, no iteration, deterministic.
- Outline support confidence: sample the fitted outline and count the
  fraction of samples with an edge pixel in their 8-neighborhood —
  Detector2D's "edge support ratio" idea.

Everything is per-frame local (no Spark dependency in this module): the
caller (multimodal.detect_pupil_frames(refine="edge")) applies it
inside the same Arrow-batched map, so the distributed shape is
unchanged — one independent work item per frame.
"""

from __future__ import annotations

import numpy as np

# 5-tap Gaussian, sigma ~1.1 (Pascal row 16:4:1 normalized) — integer
# weights so the blur is bit-deterministic across platforms.
_GAUSS5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _sep_blur5(y: np.ndarray) -> np.ndarray:
    """Separable 5-tap Gaussian blur with edge-replicate padding."""
    p = np.pad(y.astype(np.float64), 2, mode="edge")
    # horizontal then vertical, shifted-slice sums (no scipy)
    h = sum(
        w * p[:, i : i + y.shape[1]] for i, w in enumerate(_GAUSS5)
    )
    v = sum(w * h[i : i + y.shape[0], :] for i, w in enumerate(_GAUSS5))
    return v


def _sobel(y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sobel gx, gy via shifted slices on an edge-replicated pad."""
    p = np.pad(y, 1, mode="edge")
    h, w = y.shape
    tl = p[0:h, 0:w]
    tc = p[0:h, 1 : w + 1]
    tr = p[0:h, 2 : w + 2]
    ml = p[1 : h + 1, 0:w]
    mr = p[1 : h + 1, 2 : w + 2]
    bl = p[2 : h + 2, 0:w]
    bc = p[2 : h + 2, 1 : w + 1]
    br = p[2 : h + 2, 2 : w + 2]
    gx = (tr + 2.0 * mr + br) - (tl + 2.0 * ml + bl)
    gy = (bl + 2.0 * bc + br) - (tl + 2.0 * tc + tr)
    return gx, gy


def canny_edges(
    y: np.ndarray, low: float = 40.0, high: float = 80.0
) -> np.ndarray:
    """Boolean edge mask per Canny 1986. ``low``/``high`` are gradient
    thresholds in intensity units (Sobel magnitude / 4, so a clean
    step of Δ gray levels measures ≈ Δ). Pure numpy; the hysteresis
    connectivity solve is the repo's linear-time run labeler."""
    from vedb_gaze_spark.operators.multimodal import _label_components

    g = _sep_blur5(np.asarray(y, dtype=np.float64))
    gx, gy = _sobel(g)
    mag = np.hypot(gx, gy) / 4.0
    if not np.any(mag > low):
        return np.zeros(y.shape, dtype=bool)

    # non-maximum suppression: quantize gradient direction to 4
    # sectors; a pixel survives iff >= both neighbors along it.
    h, w = y.shape
    ang = np.arctan2(gy, gx)  # [-pi, pi]
    sector = (
        np.floor_divide((ang + np.pi) * (4.0 / np.pi) + 0.5, 1.0)
        .astype(np.int64)
        % 4
    )  # 0:E-W, 1:NE-SW, 2:N-S, 3:NW-SE
    mp = np.pad(mag, 1, mode="constant")
    c = mp[1 : h + 1, 1 : w + 1]
    # neighbor pairs along the quantized gradient (x=col, y=row):
    # ang≈0 → (col±1); ang≈π/4 → (col+1,row+1)/(col-1,row-1);
    # ang≈π/2 → (row±1); ang≈3π/4 → (col-1,row+1)/(col+1,row-1)
    nbr = (
        (mp[1 : h + 1, 2 : w + 2], mp[1 : h + 1, 0:w]),
        (mp[2 : h + 2, 2 : w + 2], mp[0:h, 0:w]),
        (mp[2 : h + 2, 1 : w + 1], mp[0:h, 1 : w + 1]),
        (mp[2 : h + 2, 0:w], mp[0:h, 2 : w + 2]),
    )
    keep = np.zeros((h, w), dtype=bool)
    for s, (n1, n2) in enumerate(nbr):
        sel = sector == s
        keep |= sel & (c >= n1) & (c >= n2)

    weak = keep & (mag >= low)
    strong = keep & (mag >= high)
    if not np.any(strong):
        return np.zeros((h, w), dtype=bool)
    # hysteresis: a weak component survives iff it contains a strong
    # pixel — exactly one components pass, no iterative dilation.
    lab = _label_components(weak)
    strong_labels = np.unique(lab[strong])
    return weak & np.isin(lab, strong_labels[strong_labels > 0])


def fit_ellipse_direct(xs: np.ndarray, ys: np.ndarray):
    """Direct least-squares ellipse fit (Halir & Flusser 1998 stable
    partitioning of Fitzgibbon 1996). Returns conic coefficients
    (a, b, c, d, e, f) for ax²+bxy+cy²+dx+ey+f=0 with the ellipse
    constraint 4ac−b²>0, or None when degenerate (<6 points, rank
    deficiency, no admissible eigenvector)."""
    if len(xs) < 6:
        return None
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    # center/scale normalization for conditioning (undone below)
    mx, my = x.mean(), y.mean()
    s = max(x.std(), y.std(), 1e-9)
    xn, yn = (x - mx) / s, (y - my) / s
    d1 = np.column_stack([xn * xn, xn * yn, yn * yn])
    d2 = np.column_stack([xn, yn, np.ones_like(xn)])
    s1 = d1.T @ d1
    s2 = d1.T @ d2
    s3 = d2.T @ d2
    try:
        t = -np.linalg.solve(s3, s2.T)
    except np.linalg.LinAlgError:
        return None
    m = s1 + s2 @ t
    # C1^{-1} rows for C1 = [[0,0,2],[0,-1,0],[2,0,0]]
    m = np.array([m[2] / 2.0, -m[1], m[0] / 2.0])
    try:
        evals, evecs = np.linalg.eig(m)
    except np.linalg.LinAlgError:
        return None
    cond = 4.0 * evecs[0] * evecs[2] - evecs[1] ** 2
    ok = np.where(np.isreal(evals) & (cond > 0))[0]
    if len(ok) == 0:
        return None
    a1 = np.real(evecs[:, ok[0]])
    a2 = t @ a1
    an, bn, cn, dn, en, fn = (*a1, *a2)
    # denormalize: substitute xn=(x-mx)/s, yn=(y-my)/s
    a = an / (s * s)
    b = bn / (s * s)
    c = cn / (s * s)
    d = dn / s - (2 * an * mx + bn * my) / (s * s)
    e = en / s - (2 * cn * my + bn * mx) / (s * s)
    f = (
        fn
        + (an * mx * mx + bn * mx * my + cn * my * my) / (s * s)
        - (dn * mx + en * my) / s
    )
    return (a, b, c, d, e, f)


def conic_to_ellipse(coef):
    """Conic (a,b,c,d,e,f) → (cx, cy, full_major, full_minor,
    angle_deg in [-90, 90)); None for non-ellipses. Axes are FULL
    lengths (2× semi-axis), matching the moments detector's 4·√λ
    convention."""
    a, b, c, d, e, f = coef
    den = 4.0 * a * c - b * b
    if den <= 0:
        return None
    cx = (b * e - 2.0 * c * d) / den
    cy = (b * d - 2.0 * a * e) / den
    # value of the quadratic at the center
    fc = f + (d * cx + e * cy) / 2.0
    # a conic is defined up to sign — normalize to the fc<0 gauge so
    # the eigenvalues of [[a, b/2], [b/2, c]] are positive
    if fc > 0:
        a, b, c, fc = -a, -b, -c, -fc
    # eigenvalues of [[a, b/2], [b/2, c]]
    tr2 = (a + c) / 2.0
    dis = np.sqrt(((a - c) / 2.0) ** 2 + (b / 2.0) ** 2)
    l1, l2 = tr2 - dis, tr2 + dis  # l1 <= l2
    if fc >= 0 or l1 <= 0:
        return None
    sa = np.sqrt(-fc / l1)  # semi-major (smaller eigenvalue)
    sb = np.sqrt(-fc / l2)  # semi-minor
    # ½·atan2(b, a−c) is the direction of the LARGEST conic eigenvalue
    # (the minor axis — axis² = −fc/λ inverts the ordering vs the
    # moments covariance); the major axis sits 90° away.
    ang = 0.5 * np.degrees(np.arctan2(b, a - c)) + 90.0
    while ang >= 90.0:
        ang -= 180.0
    while ang < -90.0:
        ang += 180.0
    return float(cx), float(cy), 2.0 * sa, 2.0 * sb, float(ang)


def outline_support(
    edges: np.ndarray,
    cx: float,
    cy: float,
    full_major: float,
    full_minor: float,
    angle_deg: float,
    n_samples: int = 64,
) -> float:
    """Fraction of ``n_samples`` uniformly-spaced outline points with
    an edge pixel in their 8-neighborhood — the Detector2D-style
    confidence for a fitted ellipse."""
    h, w = edges.shape
    th = np.radians(angle_deg)
    t = np.arange(n_samples) * (2.0 * np.pi / n_samples)
    ex = (full_major / 2.0) * np.cos(t)
    ey = (full_minor / 2.0) * np.sin(t)
    px = cx + ex * np.cos(th) - ey * np.sin(th)
    py = cy + ex * np.sin(th) + ey * np.cos(th)
    ix = np.floor(px + 0.5).astype(np.int64)
    iy = np.floor(py + 0.5).astype(np.int64)
    hit = np.zeros(n_samples, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            jx, jy = ix + dx, iy + dy
            inb = (jx >= 0) & (jx < w) & (jy >= 0) & (jy < h)
            hit[inb] |= edges[jy[inb], jx[inb]]
    return float(hit.mean())


def refine_pupil_ellipse(
    y: np.ndarray,
    cand: tuple[float, float, float, float, float],
    canny_low: float = 40.0,
    canny_high: float = 80.0,
    annulus_tol: float = 0.35,
    min_support: float = 0.3,
):
    """Refine a moments-ellipse candidate (cx, cy, full_minor,
    full_major, angle_deg) against Canny edge support inside its ROI.

    Returns (cx, cy, full_minor, full_major, angle_deg, support) or
    None when refinement is not possible (no edges, degenerate fit,
    support below ``min_support``) — the caller keeps the moments
    row, so refinement can only improve a detection, never lose it.
    """
    cx, cy, ax_minor, ax_major, angle = cand
    h, w = y.shape
    half = max(8, int(np.ceil(0.9 * ax_major)))
    x0 = max(0, int(np.floor(cx)) - half)
    x1 = min(w, int(np.floor(cx)) + half + 1)
    y0 = max(0, int(np.floor(cy)) - half)
    y1 = min(h, int(np.floor(cy)) + half + 1)
    roi = y[y0:y1, x0:x1]
    if roi.size == 0:
        return None
    edges = canny_edges(roi, low=canny_low, high=canny_high)
    if not np.any(edges):
        return None
    # keep edge pixels in the elliptical annulus of the candidate:
    # normalized radius in [1-tol, 1+tol] under the candidate's frame
    py_, px_ = np.nonzero(edges)
    ex = px_ + x0 - cx
    ey = py_ + y0 - cy
    th = np.radians(angle)
    u = ex * np.cos(th) + ey * np.sin(th)
    v = -ex * np.sin(th) + ey * np.cos(th)
    sa = max(ax_major / 2.0, 1e-6)
    sb = max(ax_minor / 2.0, 1e-6)
    r = np.sqrt((u / sa) ** 2 + (v / sb) ** 2)
    sel = (r >= 1.0 - annulus_tol) & (r <= 1.0 + annulus_tol)
    if sel.sum() < 6:
        return None
    coef = fit_ellipse_direct(px_[sel] + x0, py_[sel] + y0)
    if coef is None:
        return None
    ell = conic_to_ellipse(coef)
    if ell is None:
        return None
    rcx, rcy, rmaj, rmin, rang = ell
    if not (np.isfinite(rcx) and np.isfinite(rmaj) and rmaj > 0):
        return None
    # sanity: the refined center must stay inside the ROI and the
    # axes within 2x of the proposal (edge clutter rejection)
    if not (x0 <= rcx < x1 and y0 <= rcy < y1):
        return None
    if rmaj > 2.0 * ax_major or rmin < 0.25 * ax_minor:
        return None
    support = outline_support(
        edges, rcx - x0, rcy - y0, rmaj, rmin, rang
    )
    if support < min_support:
        return None
    return rcx, rcy, rmin, rmaj, rang, support
