"""Unit tests for the pure-numpy numeric kernels (TPS, DBSCAN) against
their reference semantics on small synthetic data."""

import numpy as np

from vedb_gaze_spark.functions.tps import tps_eval, tps_fit, tps_fit_cv
from vedb_gaze_spark.operators.clustering import _dbscan_numpy


def test_tps_interpolates_at_zero_lambda():
    rng = np.random.RandomState(0)
    xy = rng.rand(12, 2)
    v = np.sin(xy[:, 0] * 3) + xy[:, 1]
    theta = tps_fit(xy, v, lambd=0.0)
    pred = tps_eval(xy, xy, theta)
    np.testing.assert_allclose(pred, v, atol=1e-8)


def test_tps_recovers_affine_function():
    rng = np.random.RandomState(1)
    xy = rng.rand(20, 2)
    v = 0.3 + 0.8 * xy[:, 0] - 0.2 * xy[:, 1]
    theta = tps_fit(xy, v, lambd=0.1)
    grid = rng.rand(10, 2)
    np.testing.assert_allclose(tps_eval(grid, xy, theta), 0.3 + 0.8 * grid[:, 0] - 0.2 * grid[:, 1], atol=1e-6)


def test_tps_cv_prefers_smoothing_on_noisy_affine():
    rng = np.random.RandomState(2)
    xy = rng.rand(15, 2)
    v = 0.5 * xy[:, 0] + rng.randn(15) * 0.1
    lam, rmse = tps_fit_cv(xy, v, np.array([1e-6, 1e-2, 1.0]))
    assert lam > 1e-6  # pure interpolation overfits the noise
    assert rmse < 0.5


def test_dbscan_finds_two_blobs_and_noise():
    rng = np.random.RandomState(3)
    a = rng.randn(20, 2) * 0.05 + [0, 0]
    b = rng.randn(20, 2) * 0.05 + [3, 3]
    noise = np.array([[10.0, -10.0]])
    X = np.vstack([a, b, noise])
    ids = np.arange(100, 100 + len(X))
    labels = _dbscan_numpy(X, ids, eps=0.5, min_samples=4)
    assert len(set(labels[:20])) == 1 and labels[0] >= 0
    assert len(set(labels[20:40])) == 1 and labels[20] >= 0
    assert labels[0] != labels[20]
    assert labels[-1] == -1
    # labels are the cluster's minimal point id
    assert labels[0] == 100 and labels[20] == 120


def test_dbscan_order_independent():
    """The min-id labeling must be invariant under input permutation —
    the property that makes the operator distributable (shuffle order
    cannot change results) and oracle-checkable."""
    rng = np.random.RandomState(4)
    X = rng.rand(50, 2)
    ids = np.arange(50)
    l1 = _dbscan_numpy(X, ids, eps=0.15, min_samples=3)
    perm = rng.permutation(50)
    l2 = _dbscan_numpy(X[perm], ids[perm], eps=0.15, min_samples=3)
    assert (l1[perm] == l2).all()


def test_rbf_cv_closed_form_matches_explicit_refits():
    """The stacked-inverse LOO must reproduce the reference's explicit
    hold-one-out refit loop (calibration.py:257 LeaveOneOutXval) for
    every (smoothness, method) cell."""
    from vedb_gaze_spark.functions.rbf import _kernel, rbf_cv

    rng = np.random.RandomState(11)
    xy = rng.rand(18, 2)
    V = np.column_stack([np.sin(3 * xy[:, 0]), np.cos(2 * xy[:, 1])])
    methods = ("multiquadric", "linear")
    smooth = np.array([0.01, 0.5])

    n = len(xy)
    D = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    eps = float(D[np.triu_indices(n, 1)].mean())
    explicit = np.zeros((len(smooth), len(methods)))
    for si, s in enumerate(smooth):
        for mi, m in enumerate(methods):
            est = np.zeros_like(V)
            for i in range(n):
                keep = np.ones(n, dtype=bool)
                keep[i] = False
                K = _kernel(D[np.ix_(keep, keep)], m, eps) - s * np.eye(n - 1)
                w = np.linalg.solve(K, V[keep])
                est[i] = _kernel(D[i, keep], m, eps) @ w
            explicit[si, mi] = np.sqrt(np.mean((est - V) ** 2))

    best_method, best_smooth, cv_rmse, train_rmse = rbf_cv(
        xy, V, methods=methods, smoothnesses=smooth
    )
    si, mi = np.unravel_index(int(np.argmin(explicit)), explicit.shape)
    assert best_method == methods[mi]
    assert best_smooth == smooth[si]
    assert abs(cv_rmse - explicit[si, mi]) < 1e-8
    assert train_rmse >= 0


def test_tps_cv_closed_form_matches_explicit_refits():
    # the O(n^3)-per-lambda closed form must reproduce the reference's
    # explicit leave-one-out refit loop (calibration.py:350) exactly
    rng = np.random.RandomState(7)
    xy = rng.rand(40, 2)
    v = np.sin(3 * xy[:, 0]) + 0.1 * rng.randn(40)
    lambdas = np.array([1e-6, 1e-3, 1e-1, 1.0])

    n = len(xy)
    naive = np.zeros(len(lambdas))
    for li, lam in enumerate(lambdas):
        pred = np.zeros(n)
        for i in range(n):
            keep = np.ones(n, dtype=bool)
            keep[i] = False
            theta = tps_fit(xy[keep], v[keep], lam)
            pred[i] = tps_eval(xy[i : i + 1], xy[keep], theta)[0]
        naive[li] = float(np.sqrt(np.mean((pred - v) ** 2)))

    lam_best, rmse_best = tps_fit_cv(xy, v, lambdas)
    assert lam_best == lambdas[int(np.argmin(naive))]
    np.testing.assert_allclose(rmse_best, naive.min(), rtol=1e-8)


def test_calibration_3d_recovers_known_rotation(spark, sf_dir):
    """Kabsch init + LM angular polish must recover the fixed
    ground-truth rotation to within the jitter floor, with residual under
    the success gate, and the polish may never DEGRADE the angular loss
    it minimizes relative to the Kabsch initializer."""
    from vedb_gaze_spark.operators.calib3d import _R_TRUE, calibration_3d
    from vedb_gaze_spark.sources.tables import load_table

    rows = calibration_3d(load_table(spark, "events", sf_dir)).collect()
    assert len(rows) > 0
    import numpy as np

    # pupil normals were planted as p = R_TRUE r, so the recovered eye
    # pose (pupil -> world) is R_TRUE's inverse/transpose
    R_pose = _R_TRUE.T
    pitch_t = float(np.arcsin(np.clip(-R_pose[2, 0], -1, 1)))
    roll_t = float(np.arctan2(R_pose[2, 1], R_pose[2, 2]))
    yaw_t = float(np.arctan2(R_pose[1, 0], R_pose[0, 0]))
    for r in rows:
        assert r.success, r
        assert r.residual_deg < 1.0, r
        assert abs(r.roll - roll_t) < 0.01
        assert abs(r.pitch - pitch_t) < 0.01
        assert abs(r.yaw - yaw_t) < 0.01
        # LM only accepts cost-decreasing steps, so the refined rotation's
        # residual stays at or below Kabsch-only (tiny slack: the report
        # is the MEAN angle while LM minimizes the SQUARED-angle sum)
        assert r.residual_deg <= r.residual_kabsch_deg + 1e-3, r


def test_calibration_hmd_recovers_scale_and_rotations(spark, sf_dir):
    """HMD calibration (calibrate_3d.py:172 semantics): the z-scale
    sweep must land on the grid point nearest the planted scale, both
    per-eye rotations must recover their ground truths to within the
    jitter floor, and the LM polish may never degrade the angular loss
    relative to the Kabsch initializer at the winning scale."""
    import numpy as np

    from vedb_gaze_spark.operators.calib3d import (
        _R_TRUE,
        _R_TRUE1,
        _S_TRUE,
        _hmd_scales,
        calibration_hmd,
    )
    from vedb_gaze_spark.sources.tables import load_table

    rows = calibration_hmd(load_table(spark, "events", sf_dir)).collect()
    assert len(rows) > 0
    grid = _hmd_scales()
    s_nearest = float(grid[np.argmin(np.abs(grid - _S_TRUE))])

    def eulers(R_pose):
        return (
            float(np.arctan2(R_pose[2, 1], R_pose[2, 2])),
            float(np.arcsin(np.clip(-R_pose[2, 0], -1, 1))),
            float(np.arctan2(R_pose[1, 0], R_pose[0, 0])),
        )

    # normals were planted as n = R_true.T d, and the solver reports the
    # rotation mapping normals -> directions, i.e. R_true itself
    r0, p0, y0 = eulers(_R_TRUE)
    r1, p1, y1 = eulers(_R_TRUE1)
    for r in rows:
        assert r.success, r
        assert r.scale == round(s_nearest, 6), r
        assert r.residual_deg < 1.0, r
        for got, want in (
            (r.roll0, r0), (r.pitch0, p0), (r.yaw0, y0),
            (r.roll1, r1), (r.pitch1, p1), (r.yaw1, y1),
        ):
            assert abs(got - want) < 0.02, (r, got, want)
        assert r.residual_deg <= r.residual_kabsch_deg + 1e-3, r


def test_rbf_cv_all_singular_returns_sentinel():
    """If every kernel family's stacked inversion fails, rbf_cv must
    return the explicit failure sentinel instead of KeyError-ing on the
    argmin of an all-inf error grid."""
    import numpy as np

    from vedb_gaze_spark.functions.rbf import rbf_cv

    method, smooth, cv_rmse, train_rmse = rbf_cv(
        np.zeros((2, 2)),
        np.zeros((2, 2)),
        methods=("linear",),
        smoothnesses=np.array([0.0]),
    )
    assert method == "none"
    assert np.isnan(smooth) and np.isinf(cv_rmse) and np.isinf(train_rmse)


def test_lm_refine_improves_angular_loss_off_optimum():
    """Pure-numpy check that the LM polish does real work: start it from
    a deliberately perturbed rotation (NOT the Kabsch optimum) and it
    must drive the angular loss back to (or below) the Kabsch level; on
    anisotropic noise — where the chord and angular optima genuinely
    differ — it must strictly beat the perturbed start."""
    import numpy as np

    from vedb_gaze_spark.operators.calib3d import (
        _angles,
        _lm_refine,
        _rot,
        _rot_vec,
    )

    rng = np.random.default_rng(7)
    R_true = _rot(np.array([0.0, 0.0, 1.0]), 0.3)
    ref = rng.normal(size=(200, 3))
    ref /= np.linalg.norm(ref, axis=1, keepdims=True)
    noise = rng.normal(size=(200, 3)) * np.array([0.05, 0.002, 0.002])
    pup = ref @ R_true.T + noise
    pup /= np.linalg.norm(pup, axis=1, keepdims=True)

    H = pup.T @ ref
    U, _, Vt = np.linalg.svd(H)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R_kab = Vt.T @ D @ U.T
    cost = lambda R: float((_angles(R, pup, ref) ** 2).sum())

    start = _rot_vec(np.array([0.02, -0.015, 0.01])) @ R_kab
    refined = _lm_refine(start, pup, ref)
    assert cost(refined) < cost(start) * 0.999
    assert cost(refined) <= cost(R_kab) + 1e-12


def test_resample_tps_reproduces_linear_signal(spark):
    """A degree-1 polynomial tail means the local TPS interpolant is
    EXACT on linear signals (RBF weights vanish); the grid bounds must
    match resample_linear's convention."""
    import numpy as np

    from vedb_gaze_spark.operators.temporal import resample_tps

    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(100.0, 140.0, 300))
    rows = [
        (int(i), int(round(tt * 1e6)), 1, "view", float(3.0 * tt + 2.0))
        for i, tt in enumerate(t)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, value double"
    )
    import pyspark.sql.functions as F

    df = df.withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    out = resample_tps(df, step_s=0.5).collect()
    assert len(out) > 50
    for r in out:
        assert abs(r.value_interp - (3.0 * r.t + 2.0)) < 1e-3, r


def test_embed_project_matches_numpy_and_preserves_geometry(spark, sf_dir):
    """Random projection: (a) every projected vector equals the numpy
    signs @ v reference exactly (up to the shared half-up 6dp boundary
    rounding — the ±1 arithmetic itself is exact in binary FP); (b) the
    JL sanity: squared norms are preserved up to the d_out scale —
    mean ratio ||Sv||²/(d_out·||v||²) near 1 with bounded tails — the
    property that makes the 4x-smaller vectors usable for ANN
    pre-indexing."""
    import math

    import numpy as np

    from vedb_gaze_spark.operators.similarity import embed_project, rp_signs
    from vedb_gaze_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    got = {
        r.vec_id: np.array(list(r.proj))
        for r in embed_project(emb).collect()
    }
    S = np.array(rp_signs(), dtype=np.float64)  # (d_out, d_in)
    vecs = {
        r.vec_id: np.array(list(r.embedding), dtype=np.float64)
        for r in emb.collect()
    }
    for vid, v in vecs.items():
        want = S @ v
        want = np.floor(want * 1e6 + 0.5) / 1e6
        assert np.array_equal(got[vid], want), vid

    # geometry sanity: the JL guarantee for a ±1 matrix is norm
    # preservation — E[||Sv||²] = d_out·||v||², concentrated. (Pairwise
    # cosine correlation is the WRONG pin on this synthetic corpus:
    # near-uniform 64-dim vectors are near-orthogonal, so their cosines
    # concentrate at 0 with spread below the d_out=16 distortion floor.)
    d_out = S.shape[0]
    ratios = []
    for vid, v in vecs.items():
        n2 = float(v @ v)
        if n2 == 0:
            continue
        ratios.append(float(got[vid] @ got[vid]) / (d_out * n2))
    ratios = np.array(ratios)
    assert 0.85 < ratios.mean() < 1.15, ratios.mean()
    assert ratios.min() > 0.2 and ratios.max() < 3.0, (
        ratios.min(),
        ratios.max(),
    )


def test_iter_checkpoint_mode_follows_session_checkpoint_dir(spark, tmp_path):
    """r10 pin (r9 verdict #7): iterative spines truncate lineage via
    iter_checkpoint — localCheckpoint by default (this session has no
    checkpoint dir: executor loss cannot happen on local[*], and the
    storage round-trip would only slow the loop), RELIABLE
    df.checkpoint once the deployment sets a checkpoint dir. Observable
    pin: the reliable branch writes blocks under the configured dir;
    the default branch writes nothing anywhere (exactly the old
    localCheckpoint behavior)."""
    import os

    from vedb_gaze_spark.functions.core import iter_checkpoint

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    assert spark.sparkContext.getCheckpointDir() is None
    loc = iter_checkpoint(df)
    assert loc.count() == 100
    ckpt_dir = tmp_path / "ckpt"
    assert not ckpt_dir.exists()  # local mode touched no storage

    spark.sparkContext.setCheckpointDir(str(ckpt_dir))
    try:
        rel = iter_checkpoint(df)
        assert rel.count() == 100
        written = [
            os.path.join(r, f)
            for r, _, fs in os.walk(ckpt_dir)
            for f in fs
        ]
        assert written  # reliable-store blocks exist
    finally:
        # restore the session default for every other test
        jsc = spark.sparkContext._jsc.sc()
        getattr(jsc, "checkpointDir_$eq")(
            spark.sparkContext._jvm.scala.Option.apply(None)
        )
    assert spark.sparkContext.getCheckpointDir() is None


def test_calibration_3d_bundle_recovers_pose_with_translation(spark, sf_dir):
    """The full 6-DoF bundle (reference calibrate_monocular shape,
    calibrate_3d.py:103 — world camera free in rotation AND
    translation, gaze targets fixed): Kabsch init + chord-residual LM
    must recover the planted rotation AND translation from the
    depth-varying targets, beat the translation-less initializer's
    residual, and pass the success gate."""
    import numpy as np

    from vedb_gaze_spark.operators.calib3d import (
        _R_TRUE,
        _T_TRUE,
        calibration_3d_bundle,
    )
    from vedb_gaze_spark.sources.tables import load_table

    rows = calibration_3d_bundle(load_table(spark, "events", sf_dir)).collect()
    assert len(rows) > 0
    pitch_t = float(np.arcsin(np.clip(-_R_TRUE[2, 0], -1, 1)))
    roll_t = float(np.arctan2(_R_TRUE[2, 1], _R_TRUE[2, 2]))
    yaw_t = float(np.arctan2(_R_TRUE[1, 0], _R_TRUE[0, 0]))
    for r in rows:
        assert r.success, r
        assert r.residual_deg < 0.5, r
        # the Kabsch init has no translation — the planted T (~10 units
        # at ~500 depth ~ 1 deg of signal) must make the bundle strictly
        # better than the init on any non-trivial group
        if r.n_points >= 20:
            assert r.residual_deg < r.residual_kabsch_deg, r
            assert abs(r.tx - _T_TRUE[0]) < 1.0, r
            assert abs(r.ty - _T_TRUE[1]) < 1.0, r
            assert abs(r.tz - _T_TRUE[2]) < 1.0, r
            assert abs(r.roll - roll_t) < 0.01
            assert abs(r.pitch - pitch_t) < 0.01
            assert abs(r.yaw - yaw_t) < 0.01


# --- griddata error surface (error_computation.py:165, r12) -------------


def test_delaunay_linear_interp_is_exact_on_affine_fields():
    """The scipy-free griddata(method='linear') kernel
    (functions/delaunay.py): a linear interpolant over ANY valid
    triangulation reproduces an affine field exactly inside the hull
    and returns NaN outside it — so the pin is triangulation-agnostic."""
    from vedb_gaze_spark.functions.delaunay import delaunay, interp_linear

    rng = np.random.RandomState(7)
    pts = np.column_stack(
        [
            np.repeat(np.linspace(0.05, 0.95, 5), 5),
            np.tile(np.linspace(0.05, 0.95, 5), 5),
        ]
    ) + rng.uniform(-0.01, 0.01, (25, 2))
    vals = 2.0 + 3.0 * pts[:, 0] - 1.5 * pts[:, 1]
    tris = delaunay(pts)
    assert len(tris) >= 25  # ~2n triangles for a hull-heavy set
    # interior queries: exact affine reproduction
    qs_in = np.array([[0.5, 0.5], [0.3, 0.7], [0.8, 0.2], [0.11, 0.11]])
    got = interp_linear(pts, vals, qs_in)
    want = 2.0 + 3.0 * qs_in[:, 0] - 1.5 * qs_in[:, 1]
    assert np.allclose(got, want, atol=1e-9)
    # outside the hull: NaN (the fill_value=nan contract)
    qs_out = np.array([[-0.5, 0.5], [0.5, 1.5], [1.2, -0.2]])
    assert np.isnan(interp_linear(pts, vals, qs_out)).all()
    # determinism: same points, same triangulation
    assert tris == delaunay(pts)


def test_clough_tocher_cubic_interp():
    """The scipy-free griddata(method='cubic') kernel (r12 verdict #5;
    the method the reference's griddata call actually names,
    error_computation.py:165) — interp_cubic, the C¹ Clough-Tocher
    element with minimum-norm-network gradient estimation:

    (a) QUADRATIC fields reproduce exactly when exact gradients are
        passed — the strongest whole-construction check: every Bézier
        ordinate (corner rings, the cross-edge c111 linearity
        condition, internal-edge C¹, the apex ordinate) must be
        consistent for a quadratic to survive the three-patch split;
    (b) AFFINE fields reproduce exactly even with ESTIMATED gradients
        (the energy minimum recovers the true constant gradient — also
        pins estimate_gradients directly);
    (c) hull parity with interp_linear: identical NaN set (same
        triangulation + containment logic);
    (d) C¹ across patch boundaries: along a transect the finite-
        difference second difference scales ~linearly with step h
        (a C⁰-only interpolant like interp_linear has O(1) derivative
        jumps, h-independent)."""
    from vedb_gaze_spark.functions.delaunay import (
        estimate_gradients,
        interp_cubic,
        interp_linear,
    )

    rng = np.random.RandomState(3)
    pts = rng.rand(25, 2)
    qs = rng.rand(500, 2) * 1.2 - 0.1

    # (a) quadratic + exact gradients
    def fq(p):
        return (1.0 + 2 * p[:, 0] - 1.5 * p[:, 1] + 0.7 * p[:, 0] ** 2
                + 0.4 * p[:, 0] * p[:, 1] - 0.9 * p[:, 1] ** 2)

    def gq(p):
        return np.stack(
            [2 + 1.4 * p[:, 0] + 0.4 * p[:, 1],
             -1.5 + 0.4 * p[:, 0] - 1.8 * p[:, 1]], axis=1)

    cub = interp_cubic(pts, fq(pts), qs, grads=gq(pts))
    m = ~np.isnan(cub)
    assert m.sum() > 150  # qs spans [-0.1, 1.1]²; the hull covers ~35%
    assert np.abs(cub[m] - fq(qs)[m]).max() < 1e-12

    # (b) affine + estimated gradients
    va = 0.5 + 3 * pts[:, 0] - 2 * pts[:, 1]
    g = estimate_gradients(pts, va)
    assert np.abs(g - np.array([3.0, -2.0])).max() < 1e-9
    cuba = interp_cubic(pts, va, qs)
    ma = ~np.isnan(cuba)
    want = 0.5 + 3 * qs[ma, 0] - 2 * qs[ma, 1]
    assert np.abs(cuba[ma] - want).max() < 1e-12

    # (c) hull parity
    lin = interp_linear(pts, fq(pts), qs)
    assert (np.isnan(cub) == np.isnan(lin)).all()

    # (d) C1: second differences shrink ~linearly with h; the linear
    # interpolant's do not (slope jumps at every edge crossing)
    def smooth(p):
        return np.sin(2 * p[:, 0]) + 0.5 * p[:, 1] ** 2 + 0.3 * p[:, 0] * p[:, 1]

    v = smooth(pts)
    d2 = {}
    for n in (2001, 8001):
        tl = np.linspace(0.05, 0.95, n)
        seg = np.stack([tl, 0.3 + 0.4 * tl], axis=1)
        z = interp_cubic(pts, v, seg)
        dz = np.diff(z) / np.diff(tl)[0]
        d2[n] = np.nanmax(np.abs(np.diff(dz)))
    assert d2[8001] < d2[2001] / 2.5  # ~4x step shrink → ~4x drop
    tl = np.linspace(0.05, 0.95, 8001)
    seg = np.stack([tl, 0.3 + 0.4 * tl], axis=1)
    zl = interp_linear(pts, v, seg)
    dzl = np.diff(zl) / np.diff(tl)[0]
    assert np.nanmax(np.abs(np.diff(dzl))) > 50 * d2[8001]


def test_error_surface_grid_reproduces_affine_field_and_hull(spark):
    """error_surface_grid_points on a planted affine error field:
    grid nodes inside the marker hull carry the exact affine value
    (rounded 6dp; the floor-at-min (:200) is a no-op for barycentric
    blends of an affine field), nodes outside are NULL — and the
    left-half-only variant NULLs the right half of the grid."""
    from vedb_gaze_spark.operators.error import (
        _GRID_X,
        _GRID_Y,
        error_surface_grid_points,
    )
    from vedb_gaze_spark.plans import params as P

    eps = P.GRID_T_EPS_S

    def table(pts):
        rows = [
            (1, float(i) * eps + eps / 2, float(x), float(y),
             float(2.0 + 3.0 * x - 1.5 * y))
            for i, (x, y) in enumerate(pts)
        ]
        return spark.createDataFrame(
            rows, "user_id bigint, t double, mx double, my double, err double"
        )

    # full-frame hull: corners outside the grid envelope + interior
    full = [(0.05, 0.05), (0.95, 0.05), (0.05, 0.95), (0.95, 0.95),
            (0.5, 0.48), (0.31, 0.72), (0.68, 0.29)]
    rows = error_surface_grid_points(table(full)).collect()
    assert len(rows) == len(_GRID_X) * len(_GRID_Y)
    for r in rows:
        want = 2.0 + 3.0 * r.grid_x - 1.5 * r.grid_y
        assert r.err_est is not None and abs(r.err_est - want) <= 1e-6, r

    # left-half hull: right-half nodes must be NULL, left interior real
    left = [(0.05, 0.05), (0.45, 0.05), (0.05, 0.95), (0.45, 0.95),
            (0.25, 0.5), (0.12, 0.3)]
    rows2 = error_surface_grid_points(table(left)).collect()
    for r in rows2:
        if r.grid_x > 0.46:
            assert r.err_est is None, r
    assert any(
        r.err_est is not None for r in rows2
    ), "left-half hull should cover some grid nodes"


def test_error_grid_qc_matches_numpy_recomputation(spark, sf_dir):
    """error_grid_qc on the events table equals a from-scratch numpy
    recomputation from the collected surface + the same synthetic gaze
    signal: weighted error is the gaze-count-weighted mean of the
    surface over interpolated nodes (the reference's
    nansum(hst_pct·err)/interp_frac algebra), fraction_excluded the
    NULL-node gaze share."""
    from vedb_gaze_spark.operators.error import (
        _GRID_X,
        _GRID_Y,
        _reduced_error,
        _surface_grid_indexed,
        error_grid_qc,
    )
    from vedb_gaze_spark.sources.signals import with_gaze
    from vedb_gaze_spark.sources.tables import load_table

    events = load_table(spark, "events", sf_dir)
    got = {r.user_id: r for r in error_grid_qc(events).collect()}
    surf = {}
    # the same surface the rollup keys against (r13: the reference-
    # order spine — position medians, reduced-position error, 4σ cut)
    for r in _surface_grid_indexed(_reduced_error(events)).collect():
        surf[(r.user_id, r.ix, r.iy)] = r.err_est
    nx, ny = len(_GRID_X), len(_GRID_Y)
    from collections import defaultdict

    hist = defaultdict(int)
    for r in with_gaze(events).select("user_id", "gx", "gy").collect():
        # np.histogram2d semantics: out-of-range gaze is DROPPED (the
        # synthetic signal stays in [0.08, 0.92], so every row binned)
        if not (0 <= r.gx <= 1 and 0 <= r.gy <= 1):
            continue
        ix = min(int(np.floor(r.gx * nx)), nx - 1)
        iy = min(int(np.floor(r.gy * ny)), ny - 1)
        hist[(r.user_id, ix, iy)] += 1
    users = {u for (u, _, _) in hist}
    assert set(got) == users
    for u in users:
        n_gaze = sum(n for (uu, _, _), n in hist.items() if uu == u)
        n_interp = 0
        werr = 0.0
        for (uu, ix, iy), n in hist.items():
            if uu != u:
                continue
            est = surf.get((u, ix, iy))
            if est is not None:
                n_interp += n
                werr += n * est
        r = got[u]
        assert r.n_gaze == n_gaze
        if n_interp:
            want = np.floor(werr / n_interp * 1e6 + 0.5) / 1e6
            # one 6dp quantum of slack: Spark's sum order vs this
            # loop's can differ by ~1 ulp, which flips floor(x+0.5)
            # when the true value sits exactly on the rounding boundary
            assert abs(r.gaze_err_weighted - want) <= 1.001e-6, (u, r)
        else:
            assert r.gaze_err_weighted is None
        want_f = np.floor((n_gaze - n_interp) / n_gaze * 1e6 + 0.5) / 1e6
        assert abs(r.fraction_excluded - want_f) < 1e-9, (u, r)


def test_error_surface_tps_cv_selects_smoothing_and_reproduces_affine(spark):
    """error_surface_tps_cv (r12; compute_error's DEFAULT method,
    error_computation.py:20): (a) a noiseless affine error field is
    reproduced exactly on the grid — the affine part of a TPS carries
    zero bending energy, so every lambda in the reference grid yields
    the same exact surface; (b) on a NOISY affine field the LOO sweep
    picks more smoothing than the interpolating end of the grid, and
    the surface stays closer to the clean field than the lambda=1e-6
    interpolator (the reason tps_cv is the reference default); (c) the
    reference's extrapolate=False default (r13): nodes OUTSIDE the fit
    points' convex hull are NULL — the :197 mask by the griddata NaN
    pattern — and passing extrapolate=True restores values
    everywhere."""
    from vedb_gaze_spark.functions.tps import tps_eval, tps_fit
    from vedb_gaze_spark.operators.error import (
        _TPS_CV_LAMBDAS,
        error_surface_tps_cv_points,
    )
    from vedb_gaze_spark.plans import params as P

    eps = P.GRID_T_EPS_S
    rng = np.random.RandomState(12)
    pts = rng.rand(24, 2) * 0.9 + 0.05

    def table(noise):
        rows = [
            (1, float(i) * eps + eps / 2, float(x), float(y),
             float(1.0 + 2.0 * x + 0.5 * y + n))
            for i, ((x, y), n) in enumerate(zip(pts, noise))
        ]
        return spark.createDataFrame(
            rows, "user_id bigint, t double, mx double, my double, err double"
        )

    # (a) noiseless affine: exact on every IN-HULL grid node; the
    # extrapolate=True face is exact on ALL nodes (affine TPS
    # extrapolates exactly)
    clean = error_surface_tps_cv_points(table(np.zeros(24))).collect()
    assert len(clean) == 48
    floor = min(1.0 + 2.0 * x + 0.5 * y for x, y in pts)
    n_in = n_out = 0
    for r in clean:
        if r.err_est is None:
            n_out += 1
            continue
        n_in += 1
        want = max(1.0 + 2.0 * r.grid_x + 0.5 * r.grid_y, floor)
        assert abs(r.err_est - want) < 1e-5, r
    assert n_in >= 30  # pts span [0.05, 0.95]^2: most of the 8x6 grid
    full = error_surface_tps_cv_points(
        table(np.zeros(24)), extrapolate=True
    ).collect()
    assert all(r.err_est is not None for r in full)
    for r in full:
        want = max(1.0 + 2.0 * r.grid_x + 0.5 * r.grid_y, floor)
        assert abs(r.err_est - want) < 1e-5, r

    # (c) the masked set IS the hull complement (shared Delaunay hull)
    from vedb_gaze_spark.functions.delaunay import interp_linear
    from vedb_gaze_spark.operators.error import _GRID_X, _GRID_Y
    gxg, gyg = np.meshgrid(_GRID_X, _GRID_Y)
    nodes = np.column_stack([gxg.ravel(), gyg.ravel()])
    probe = interp_linear(pts, np.zeros(24), nodes)
    want_null = {
        (x, y) for (x, y), p_ in zip(map(tuple, nodes), probe)
        if np.isnan(p_)
    }
    got_null = {(r.grid_x, r.grid_y) for r in clean if r.err_est is None}
    assert got_null == want_null
    assert n_out == len(want_null)

    # (b) noisy affine: CV surface beats the pure interpolator in-hull
    noise = rng.randn(24) * 0.3
    noisy = {
        (r.grid_x, r.grid_y): r.err_est
        for r in error_surface_tps_cv_points(table(noise)).collect()
        if r.err_est is not None
    }
    theta = tps_fit(pts, 1.0 + 2.0 * pts[:, 0] + 0.5 * pts[:, 1] + noise,
                    _TPS_CV_LAMBDAS[0])
    worse = better = 0.0
    for (gx, gy), est in noisy.items():
        want = 1.0 + 2.0 * gx + 0.5 * gy
        interp = float(
            tps_eval(np.array([[gx, gy]]), pts, theta)[0]
        )
        better += (est - want) ** 2
        worse += (interp - want) ** 2
    assert better < worse, (better, worse)


def test_reference_resolution_surface_matches_numpy(spark):
    """r12 verdict #4: the surface grid is parameterized — grid_nodes
    reproduces the reference's vertical_horizontal_smooth_error_resolution
    semantics ((vres, hres) rows/cols on linspace(0, 1), scalar =
    fraction-of-image_resolution; error_computation.py:20,:152-162) —
    and error_surface_grid_points at the REFERENCE resolution matches a
    from-scratch numpy reimplementation on a planted affine field:
    affine values inside the marker hull (linear barycentric
    interpolation is exact on affine fields), NULL outside, floored at
    the minimum observed error. Hull membership is recomputed
    independently via a monotone-chain convex hull + half-plane test.
    A reduced (30, 40) image-fraction grid keeps the pin fast; the
    (300, 400) default itself is pinned shape-only below."""
    from vedb_gaze_spark.operators.error import (
        REFERENCE_RESOLUTION,
        error_surface_grid_points,
        grid_nodes,
    )
    from vedb_gaze_spark.plans import params as P

    # grid_nodes semantics pins
    gx, gy = grid_nodes(REFERENCE_RESOLUTION)
    assert len(gx) == 400 and len(gy) == 300
    assert gx[0] == 0.0 and gx[-1] == 1.0 and gy[0] == 0.0 and gy[-1] == 1.0
    sx, sy = grid_nodes(0.25)  # the reference's scalar path
    assert len(sx) == int(P.IMAGE_W * 0.25) == 512
    assert len(sy) == int(P.IMAGE_H * 0.25) == 384
    dx, dy = grid_nodes()  # no knobs → the 8×6 bench grid, unchanged
    assert len(dx) == 8 and len(dy) == 6 and dx[0] == 0.1 and dx[-1] == 0.9

    eps = P.GRID_T_EPS_S
    rng = np.random.RandomState(7)
    pts = rng.rand(18, 2) * 0.8 + 0.1
    errs = 1.0 + 2.0 * pts[:, 0] + 0.5 * pts[:, 1]
    rows = [
        (1, float(i) * eps + eps / 2, float(x), float(y), float(e))
        for i, ((x, y), e) in enumerate(zip(pts, errs))
    ]
    e = spark.createDataFrame(
        rows, "user_id bigint, t double, mx double, my double, err double"
    )
    res = (30, 40)
    got = {
        (r.grid_x, r.grid_y): r.err_est
        for r in error_surface_grid_points(e, resolution=res).collect()
    }
    ngx, ngy = grid_nodes(res)
    assert len(got) == 30 * 40 and len(ngx) == 40 and len(ngy) == 30

    # independent hull: monotone chain + signed-area half-plane test
    def hull(points):
        P2 = sorted(map(tuple, points))
        def half(seq):
            h = []
            for q in seq:
                while len(h) >= 2 and (
                    (h[-1][0] - h[-2][0]) * (q[1] - h[-2][1])
                    - (h[-1][1] - h[-2][1]) * (q[0] - h[-2][0])
                ) <= 0:
                    h.pop()
                h.append(q)
            return h
        lo, hi = half(P2), half(reversed(P2))
        return np.array(lo[:-1] + hi[:-1])

    H = hull(pts)
    A, B = H, np.roll(H, -1, axis=0)
    floor_v = errs.min()
    n_in = n_out = 0
    for yy in ngy:
        for xx in ngx:
            cross = (B[:, 0] - A[:, 0]) * (yy - A[:, 1]) - (
                B[:, 1] - A[:, 1]
            ) * (xx - A[:, 0])
            est = got[(xx, yy)]
            if (cross > 1e-9).all():  # strictly inside
                n_in += 1
                want = max(1.0 + 2.0 * xx + 0.5 * yy, floor_v)
                assert est is not None and abs(est - want) < 1e-5, (xx, yy)
            elif (cross < -1e-9).any():  # strictly outside
                n_out += 1
                assert est is None, (xx, yy, est)
    assert n_in > 100 and n_out > 100  # both regimes exercised

    # the (300, 400) reference default, shape-only (120k nodes/user)
    big = error_surface_grid_points(e, resolution=REFERENCE_RESOLUTION)
    assert big.count() == 300 * 400


def test_reduced_error_is_norm_of_position_medians(spark, sf_dir):
    """r13: the surface-input spine follows the reference's exact ORDER
    (error_computation.py:106-143) — confidence gate, cluster-median of
    the POSITIONS, error of the REDUCED positions, then the median±4σ
    cut on the reduced errors. Recomputed from scratch off the signal
    view; the r12 median-of-per-point-error-norms is genuinely
    different on this data (asserted), so the pin distinguishes the two
    orders."""
    from collections import defaultdict

    from vedb_gaze_spark.operators.error import (
        PPD,
        _outlier_cut,
        _reduced_error,
    )
    from vedb_gaze_spark.plans import params as P
    from vedb_gaze_spark.sources.signals import with_gaze
    from vedb_gaze_spark.sources.tables import load_table

    events = load_table(spark, "events", sf_dir)
    g = with_gaze(events).where(f"conf > {P.MIN_CONFIDENCE}").collect()
    groups = defaultdict(list)
    for r in g:
        groups[(r.user_id, int(np.floor(r.t / P.GRID_T_EPS_S)))].append(r)
    want = {}
    any_diff = False
    for (u, c), rows in groups.items():
        mx = float(np.median([r.mx for r in rows]))
        my = float(np.median([r.my for r in rows]))
        gx = float(np.median([r.gx for r in rows]))
        gy = float(np.median([r.gy for r in rows]))
        err = float(np.hypot((gx - mx) * P.IMAGE_W,
                             (gy - my) * P.IMAGE_H) / PPD)
        med_of_norms = float(np.median([
            np.hypot((r.gx - r.mx) * P.IMAGE_W,
                     (r.gy - r.my) * P.IMAGE_H) / PPD
            for r in rows
        ]))
        if abs(err - med_of_norms) > 1e-9:
            any_diff = True
        want[(u, c)] = (mx, my, err)
    assert any_diff  # the two reduction orders differ on this data

    got = {}
    for r in _reduced_error(events).collect():
        c = int(np.floor(r.t / P.GRID_T_EPS_S))
        got[(r.user_id, c)] = (r.mx, r.my, r.err)
    assert set(got) == set(want)
    for k in want:
        for a, b in zip(got[k], want[k]):
            assert abs(a - b) < 1e-9, (k, got[k], want[k])

    # the cut: per user, keep |err − median| <= k·std_pop; k=None is a
    # no-op; a planted far outlier is dropped while the rest survive
    red = _reduced_error(events)
    assert _outlier_cut(red, None).count() == red.count()
    # n=30 inliers: with a single outlier x among n points,
    # std_pop ≈ x/√n, so the 4σ cut only triggers for √n > 4
    rows = [(1, float(i), 0.5, 0.5, 1.0 + 0.01 * i) for i in range(30)]
    rows.append((1, 99.0, 0.5, 0.5, 500.0))
    pl = spark.createDataFrame(
        rows, "user_id bigint, t double, mx double, my double, err double"
    )
    kept = _outlier_cut(pl, 4.0).collect()
    errs = np.array([r[4] for r in rows])
    keep_mask = np.abs(errs - np.median(errs)) <= 4.0 * errs.std()
    assert {r.err for r in kept} == set(errs[keep_mask])
    assert 500.0 not in {r.err for r in kept}


def test_error_grid_qc_drops_out_of_range_gaze(spark, sf_dir):
    """np.histogram2d with edges linspace(0,1,n+1) drops gaze outside
    [0,1]^2 from the total AND the weighting (error_computation.py:208;
    ADVICE r12 #2 — r12 clamped such gaze into edge bins, inflating
    n_gaze and shifting gaze_err_weighted/fraction_excluded). Injecting
    out-of-range rows through the gaze override must leave every QC
    number unchanged, and the ==1 right edge must still bin (numpy's
    closed final interval)."""
    from vedb_gaze_spark.operators.error import error_grid_qc
    from vedb_gaze_spark.sources.signals import with_gaze
    from vedb_gaze_spark.sources.tables import load_table

    events = load_table(spark, "events", sf_dir)
    base_gaze = with_gaze(events).select("user_id", "gx", "gy")
    uid = base_gaze.first().user_id
    junk = spark.createDataFrame(
        [
            (uid, -0.01, 0.5), (uid, 1.2, 0.5), (uid, 0.5, -3.0),
            (uid, 0.5, 1.0001), (uid, float("nan"), 0.5),
        ],
        "user_id bigint, gx double, gy double",
    )
    want = {r.user_id: r for r in error_grid_qc(events).collect()}
    got = {
        r.user_id: r
        for r in error_grid_qc(
            events, gaze=base_gaze.unionByName(junk)
        ).collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u].n_gaze == want[u].n_gaze, u
        assert got[u].gaze_err_weighted == want[u].gaze_err_weighted, u
        assert got[u].fraction_excluded == want[u].fraction_excluded, u

    # the ==1.0 edge is IN-range: exactly-1 gaze lands in the last bin
    edge = spark.createDataFrame(
        [(uid, 1.0, 1.0)], "user_id bigint, gx double, gy double"
    )
    got_edge = {
        r.user_id: r
        for r in error_grid_qc(
            events, gaze=base_gaze.unionByName(edge)
        ).collect()
    }
    assert got_edge[uid].n_gaze == want[uid].n_gaze + 1


def test_tps_cv_lambda_grid_is_the_reference_16_point_default():
    """_TPS_CV_LAMBDAS must reproduce compute_error's literal 16-value
    default list (error_computation.py:20-36 == np.logspace(-6, 1, 16),
    exponent step 7/15) BIT-exactly, and the r12 15-point grid it
    replaces (logspace(-6, 1, 15)) must be demonstrably different: the
    two grids share only their endpoints, and on a generic noisy field
    the LOO sweep selects different winning lambdas (ADVICE r12 #1 —
    the default tps_cv surface diverged from the reference's)."""
    from vedb_gaze_spark.functions.tps import tps_fit_cv
    from vedb_gaze_spark.operators.error import _TPS_CV_LAMBDAS

    reference_default = (
        1e-06, 2.9286445646252375e-06, 8.576958985908945e-06,
        2.5118864315095822e-05, 7.356422544596421e-05,
        0.00021544346900318845, 0.000630957344480193,
        0.0018478497974222907, 0.0054116952654646375,
        0.01584893192461114, 0.04641588833612782, 0.1359356390878527,
        0.3981071705534969, 1.165914401179831, 3.414548873833601, 10.0,
    )
    assert _TPS_CV_LAMBDAS == reference_default  # bit-exact, all 16

    old_15 = tuple(10.0 ** (-6.0 + 7.0 * i / 14.0) for i in range(15))
    shared = {x for x in old_15 if any(abs(x - y) / y < 1e-12
                                       for y in reference_default)}
    assert shared == {1e-06, 10.0}  # interiors are disjoint

    rng = np.random.RandomState(0)
    pts = rng.rand(20, 2) * 0.9 + 0.05
    v = (np.sin(3 * pts[:, 0]) + 0.5 * pts[:, 1] ** 2
         + rng.randn(20) * 0.15)
    lam_old, _ = tps_fit_cv(pts, v, np.asarray(old_15))
    lam_new, _ = tps_fit_cv(pts, v, np.asarray(_TPS_CV_LAMBDAS))
    assert lam_old != lam_new  # 0.01 vs 0.015848…: the fix is load-bearing
    assert lam_new in reference_default


def test_error_surface_grid_smoothing_blur(spark):
    """The reference's optional error_smoothing_kernels box blur
    (error_computation.py:168-172) on the griddata surface: (a) a
    constant field blurs to itself; (b) hull NaNs survive the blur
    (the reference restores them after blurring); (c) an interior node
    of an affine field equals the manual 3x3 mean of the pre-blur
    surface with REFLECT_101 edges (cv2.blur's default border). The
    NaN fill is np.nanmax(gaze_err) — the max OBSERVED pointwise error
    on the reduced points, NOT the interpolated surface max (ADVICE
    r12 #3; on this affine field the data max 4.775 sits at
    (0.95, 0.05), outside the 0.1–0.9 grid span, so the two fills
    genuinely differ and the recompute below distinguishes them)."""
    from vedb_gaze_spark.operators.error import (
        _GRID_X,
        _GRID_Y,
        _box_blur,
        error_surface_grid_points,
    )
    from vedb_gaze_spark.plans import params as P

    eps = P.GRID_T_EPS_S

    def table(const=None):
        pts = [(0.05, 0.05), (0.95, 0.05), (0.05, 0.95), (0.95, 0.95),
               (0.5, 0.48), (0.31, 0.72)]
        rows = [
            (1, float(i) * eps + eps / 2, float(x), float(y),
             float(2.5 if const else 2.0 + 3.0 * x - 1.5 * y))
            for i, (x, y) in enumerate(pts)
        ]
        return spark.createDataFrame(
            rows, "user_id bigint, t double, mx double, my double, err double"
        )

    # (a) constant field: blur is a no-op inside the hull
    got = error_surface_grid_points(table(const=True), smoothing=(3, 3))
    for r in got.collect():
        if r.err_est is not None:
            assert abs(r.err_est - 2.5) < 1e-6, r

    # (b)+(c): affine field, left-half hull table with NaNs
    plain = {
        (r.grid_x, r.grid_y): r.err_est
        for r in error_surface_grid_points(table()).collect()
    }
    sm = {
        (r.grid_x, r.grid_y): r.err_est
        for r in error_surface_grid_points(
            table(), smoothing=(3, 3)
        ).collect()
    }
    assert {k for k, v in plain.items() if v is None} == {
        k for k, v in sm.items() if v is None
    }
    # manual recompute: fill NaNs with the max OBSERVED err (the
    # planted data max, not the surface max), blur, restore, floor
    pts = [(0.05, 0.05), (0.95, 0.05), (0.05, 0.95), (0.95, 0.95),
           (0.5, 0.48), (0.31, 0.72)]
    data_max = max(2.0 + 3.0 * x - 1.5 * y for x, y in pts)
    img = np.array(
        [[plain[(gx, gy)] for gx in _GRID_X] for gy in _GRID_Y],
        dtype="float64",
    )
    nanmask = np.isnan(img)
    assert data_max > np.nanmax(img) + 0.1  # the two fills differ here
    filled = np.where(nanmask, data_max, img)
    want = _box_blur(filled, 3, 3)
    vmin = np.nanmin(img)  # planted errs floor at the min observed err
    for iy, gy in enumerate(_GRID_Y):
        for ix, gx in enumerate(_GRID_X):
            if not nanmask[iy, ix]:
                w = max(want[iy, ix], vmin)
                assert abs(sm[(gx, gy)] - w) < 1e-5, (ix, iy)
    # the blur itself: a hand-computed interior 3x3 mean
    manual = filled[1:4, 1:4].mean()
    assert abs(_box_blur(filled, 3, 3)[2, 2] - manual) < 1e-12
