"""Named step profiles — the reference's config-driven API surface.

The reference parameterizes every pipeline step by a `<step>-<tag>`
YAML profile (vedb_gaze/config/*.yaml) resolved by the pipelines.py
step loaders (pipelines.py:96 `pupil-{param_tag}.yaml`, :159
`marker-{param_tag}.yaml`, :229/:293 `marker_parsing-{param_tag}.yaml`,
:361 `calibration-{param_tag}.yaml`, :425 gaze / error variants). A
reference user names steps by these tags; this registry resolves the
same names to the Spark-first operators with the equivalent parameter
choices, so a profile-driven driver ports by changing only the
resolver import.

Each profile is (callable, frozen kwargs, notes). Parameters with no
distributed counterpart are named in `notes` rather than silently
dropped — resolve() never guesses. The profile VALUES mirror what the
reference yaml encodes (e.g. checkerboard_4x7squares → a 4×7-square
board has 3×6 inner corners, our `board=(3, 6)`), re-expressed as our
operator kwargs; no yaml files are vendored or parsed at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass(frozen=True)
class Profile:
    step: str
    fn: Callable
    kwargs: dict = field(default_factory=dict)
    notes: str = ""

    def __call__(self, *dfs):
        return self.fn(*dfs, **self.kwargs)


def _build() -> dict[str, Profile]:
    from vedb_gaze_spark.operators.binocular import gaze_map_binocular
    from vedb_gaze_spark.operators.calibration import (
        calibration_linear,
        calibration_poly,
        calibration_tps,
    )
    from vedb_gaze_spark.operators.error import (
        error_surface_tps,
        error_surface_tps_cv,
    )
    from vedb_gaze_spark.operators.multimodal import (
        detect_checkerboard_frames,
        detect_pupil_frames,
        detect_ring_markers,
    )
    from vedb_gaze_spark.plans.pipeline import (
        marker_filter_cluster,
        marker_filter_split,
    )

    p: dict[str, Profile] = {}

    # -- pupil-*.yaml (pipelines.py:96) ---------------------------------
    p["pupil-plab_default"] = Profile(
        "pupil",
        detect_pupil_frames,
        {},
        "plabs_detect_pupil over eye frames (pupil_detection_pl.py:11); "
        "start_frame/end_frame are a slice of the input frames "
        "DataFrame (a WHERE on frame_id), not operator knobs. "
        "refine='edge' (r11) adds the Detector2D-style Canny edge-"
        "support refinement from public algorithms; the pylids/pytorch "
        "tags name trained pytorch detectors, still excluded.",
    )
    p["pupil-plab_default_testshort"] = Profile(
        "pupil",
        detect_pupil_frames,
        {},
        "same detector; the reference tag only narrows the frame range "
        "(slice frames upstream).",
    )

    # -- marker-*.yaml (pipelines.py:159) -------------------------------
    p["marker-circles_halfres"] = Profile(
        "marker",
        detect_ring_markers,
        {},
        "concentric-circle marker detection (find_concentric_circles); "
        "halfres = the reference downsamples frames before detection — "
        "resize upstream (resize is a frame transform, not a detector "
        "knob here). The reference tag's detector binarizes with the "
        "three-pass adaptive front-end and gates candidates on "
        "ellipse-fit residual (circle_detector.py:214/:514) — "
        "detect_ring_markers(threshold='adaptive', fit_tol=...) names "
        "both behaviors (r14); the profile default stays the planted-"
        "frame-exact global threshold.",
    )
    p["marker-circles_halfres_testshort"] = Profile(
        "marker", detect_ring_markers, {}, "frame-range variant of the above."
    )
    p["marker-checkerboard_halfres_4x7squares"] = Profile(
        "marker",
        detect_checkerboard_frames,
        {"board": (3, 6)},
        "a 4x7-SQUARE board has 3x6 inner corners — the reference's "
        "checkerboard_size convention (marker_detection.py:185).",
    )
    p["marker-checkerboard_halfres_7x9squares"] = Profile(
        "marker",
        detect_checkerboard_frames,
        {"board": (6, 8)},
        "7x9 squares -> 6x8 inner corners.",
    )

    # -- marker_parsing-*.yaml (pipelines.py:229/:293) -------------------
    for tag in ("basic_split", "split_circles", "split_checkerboards"):
        p[f"marker_parsing-{tag}"] = Profile(
            "marker_parsing",
            marker_filter_split,
            {},
            "find_epochs clean->split (filter_and_split, "
            "marker_parsing.py:625); the circles/checkerboards tags "
            "differ only in which detector produced the stream.",
        )
    for tag in (
        "cluster_default",
        "cluster_circles",
        "cluster_checkerboards",
        "cluster_val_acc_ver01",
        "cluster_val_acc_ver02",
        "cluster_val_acc_ver03",
    ):
        p[f"marker_parsing-{tag}"] = Profile(
            "marker_parsing",
            marker_filter_cluster,
            {},
            "find_epochs clean->cluster (filter_and_cluster, "
            "marker_parsing.py:661) with the grid/DBSCAN gates; the "
            "val_acc_ver* tags tune cluster_kw thresholds the plan "
            "keeps in plans/params.py.",
        )

    # -- calibration-*.yaml (pipelines.py:361) ---------------------------
    p["calibration-monocular_pl_default"] = Profile(
        "calibration",
        calibration_poly,
        {},
        "pupil-labs 2d polynomial fit, model_n=7 two-pass outlier cut "
        "(calibrate_2d_polynomial, calibration.py:102).",
    )
    for tag in (
        "monocular_pl_cluster_median",
        "monocular_pl_cluster_median_conf75",
    ):
        p[f"calibration-{tag}"] = Profile(
            "calibration",
            calibration_poly,
            {},
            "same polynomial fit; cluster_reduce_fn=median and the "
            "confidence floor are parse-stage choices "
            "(plans/params.py MIN_CONFIDENCE / the cluster-median "
            "reduction calibration_tps applies).",
        )
    for tag in (
        "monocular_tps_default",
        "monocular_tps_cluster_median",
        "monocular_tps_cv_cluster_median",
        "monocular_tps_cv_cluster_median_conf75",
        "monocular_tps_cv_cluster_median_conf40_cut3std",
        "monocular_tps_cv_cluster_median_conf75_cut3std",
    ):
        p[f"calibration-{tag}"] = Profile(
            "calibration",
            calibration_tps,
            {},
            "thin-plate-spline gaze fit on cluster-median points "
            "(_fit_tps_gaze_cv, calibration.py:350); the non-cv tags "
            "fix lambd=1 where ours cross-validates a grid containing "
            "1.0 — the CV winner dominates the fixed choice by "
            "construction.",
        )
    p["calibration-binocular_pl_default"] = Profile(
        "calibration",
        gaze_map_binocular,
        {},
        "calibrate_2d_binocular + Binocular_Gaze_Mapper pairing "
        "(calibration.py:207).",
    )

    # -- gaze / error (pipelines.py:425+) --------------------------------
    p["gaze-default_mapper"] = Profile(
        "gaze",
        calibration_linear,
        {},
        "gaze_mapper (gaze_mapping.py:2): apply the fitted per-user "
        "map — folded into the calibration operators' map stage; the "
        "linear face is the registered/oracled form.",
    )
    # every error profile carries the reference's surface grid —
    # vertical_horizontal_smooth_error_resolution=(300, 400) on
    # linspace(0, 1) (error_computation.py:20,:158-162) — so replaying
    # a reference config reproduces the reference's surface SHAPE; the
    # registered bench keys keep the compact 8x6 grid (operators/
    # error.py grid_nodes).
    ref_grid = {"resolution": (300, 400), "span": (0.0, 1.0)}
    p["error-smooth_tps_default"] = Profile(
        "error",
        error_surface_tps,
        dict(ref_grid),
        "compute_error's tps error surface (error_computation.py:18) "
        "at the reference's (300, 400) image-fraction grid.",
    )
    p["error-smooth_tps_lambda0p1"] = Profile(
        "error",
        error_surface_tps,
        {"lambd": 0.1, **ref_grid},
        "lambda=0.1 surface.",
    )
    for tag in (
        "smooth_tps_cv_clust_med_outlier4std",
        "smooth_tps_cv_clust_med_outlier4std_conf40_fov101",
        "smooth_tps_cv_clust_med_outlier4std_conf40_fov125",
        "smooth_tps_cv_clust_med_outlier4std_conf40_fov12mri",
        "smooth_tps_cv_clust_med_outlier4std_conf75_fov101",
        "smooth_tps_cv_clust_med_outlier4std_conf75_fov125",
        "smooth_tps_cv_clust_med_outlier4std_conf75_fov12mri",
    ):
        p[f"error-{tag}"] = Profile(
            "error",
            error_surface_tps_cv,
            dict(ref_grid),
            "tps_cv error surface (r12: the true LOO-lambda-selected "
            "operator — compute_error's DEFAULT method, "
            "error_computation.py:20/:183); fov* tags rescale "
            "degrees-per-screen (plans/params.py DEG_HORIZ/DEG_VERT), "
            "conf*/outlier* are parse-stage gates.",
        )
    return p


PROFILES: dict[str, Profile] = _build()


def list_profiles(step: str | None = None) -> list[str]:
    """Registered profile names, optionally restricted to one step."""
    return sorted(
        n for n, pr in PROFILES.items() if step is None or pr.step == step
    )


def resolve(name: str) -> Profile:
    """The operator behind a reference `<step>-<tag>` profile name.
    Unknown names raise with the step's known tags — never a silent
    default."""
    if name in PROFILES:
        return PROFILES[name]
    step = name.split("-", 1)[0]
    known = list_profiles(step) or list_profiles()
    raise KeyError(f"unknown profile {name!r}; known: {', '.join(known)}")


def _points_face(fn: Callable) -> Callable | None:
    """The POINT-TABLE twin of a profile's events-face operator — the
    (user_id, t, px, py, gx, gy) input every calibration consumes when
    its points come from paired pixel detections instead of the events
    signal view."""
    from vedb_gaze_spark.operators.calibration import (
        calibration_linear,
        calibration_linear_points,
        calibration_poly,
        calibration_poly_points,
        calibration_tps,
        calibration_tps_points,
    )

    return {
        calibration_linear: calibration_linear_points,
        calibration_poly: calibration_poly_points,
        calibration_tps: calibration_tps_points,
    }.get(fn)


def run_profile_chain(
    steps,
    eye_frames,
    world_frames,
    match_tol_s: float = 0.5,
    min_confidence: float = 0.6,
):
    """Execute a reference ``make_pipeline`` chain (pipelines.py:361)
    of `<step>-<tag>` profile names over raw frame tables — the
    one-call composition a reference user writes as
    make_pipeline(['pupil-plab_default', 'marker-circles_halfres',
    'marker_parsing-cluster_default', 'calibration-...', 'error-...']).

    Glue between steps is the SAME plan pupil_pixel_pipeline compiles
    for its fixed operators (pair_pupil_markers / single_detection_gate
    are shared code): pupil and marker detections pair by nearest time
    within ``match_tol_s``; the paired table feeds the calibration
    profile's point face; the error profile's surface is fitted to the
    mapped-gaze error of the folded linear gaze mapper (the
    'gaze-default_mapper' step, implicit exactly as the reference folds
    Calibration.map into its error step). Returns {profile_name:
    DataFrame} with every step's artifact; the paired point table rides
    along under '_pairs'.

    Steps may appear in any subset, but calibration/gaze/error steps
    need a pupil and a marker step earlier in the list — a missing
    producer raises instead of silently fitting nothing.

    Binocular chains (r12, closing the r11 NotImplementedError): when
    the calibration profile is the binocular mapper
    (calibration-binocular_pl_default), ``eye_frames`` must carry an
    ``eye`` column (0/1 — the reference records eye0/eye1 video
    separately; tag them when unioning). The chain then runs the pupil
    profile per eye, pairs EACH eye's detections with the marker
    stream through the same pair_pupil_markers glue, and feeds the
    tagged union to gaze_map_binocular_points (binocular.py) — the
    registered gaze_map_binocular kernel on real detections. A later
    error step fits its surface to the BINOCULAR mapped-gaze error."""
    from pyspark.sql import functions as F

    from vedb_gaze_spark.functions.core import iter_checkpoint
    from vedb_gaze_spark.operators.binocular import (
        gaze_map_binocular,
        gaze_map_binocular_points,
    )
    from vedb_gaze_spark.operators.calibration import (
        calibration_linear_points,
    )
    from vedb_gaze_spark.operators.error import (
        error_surface_tps_cv,
        error_surface_tps_points,
    )
    from vedb_gaze_spark.operators.multimodal import (
        detections_to_marker_stream,
    )
    from vedb_gaze_spark.plans import params as P
    from vedb_gaze_spark.plans.pipeline import (
        pair_pupil_markers,
        single_detection_gate,
    )
    from pyspark.sql import Window

    out: dict = {}
    pup = det = pairs = None
    pup_by_eye: dict | None = None
    binoc = None  # (mapped rows, tagged point table) of a binocular fit

    def paired():
        nonlocal pairs
        if pairs is None:
            if pup is None or det is None:
                raise ValueError(
                    "calibration/gaze/error steps need a pupil and a "
                    "marker step earlier in the chain"
                )
            p = pup.where(F.col("confidence") > min_confidence)
            # pair-table-sized; consumed by fit + map-error + surface —
            # the pupil_pixel_pipeline checkpoint idiom
            pairs = iter_checkpoint(
                pair_pupil_markers(
                    p, single_detection_gate(det), match_tol_s
                ),
                eager=False,
            )
            out["_pairs"] = pairs
        return pairs

    def binocular_points():
        """Tagged per-eye point table for the binocular mapper: each
        eye's confidence-gated detections paired with the marker
        stream (the same glue as paired()), marker positions as the
        calibration targets, a deterministic per-user row id for the
        pairing window's tie order."""
        if pup_by_eye is None:
            raise ValueError(
                "calibration-binocular_pl_default needs eye_frames "
                "with an 'eye' column (0/1) — the reference records "
                "eye0/eye1 video separately; tag them when unioning"
            )
        if det is None:
            raise ValueError(
                "binocular calibration needs a marker step earlier in "
                "the chain"
            )
        m = single_detection_gate(det)
        per_eye = []
        for e in (0, 1):
            p = pup_by_eye[e].where(F.col("confidence") > min_confidence)
            per_eye.append(
                pair_pupil_markers(p, m, match_tol_s).withColumn(
                    "eye", F.lit(e).cast("int")
                )
            )
        g = per_eye[0].unionByName(per_eye[1])
        wid = Window.partitionBy("user_id").orderBy("t", "eye")
        return g.select(
            "user_id",
            "eye",
            F.row_number().over(wid).cast("long").alias("event_id"),
            "t",
            "px",
            "py",
            F.col("mx").alias("gx"),
            F.col("my").alias("gy"),
            F.lit(1.0).alias("conf"),  # detections pre-gated above
        )

    def mapped_error():
        if binoc is not None:
            # binocular chain: the error field is the BINOCULAR mapped
            # gaze vs its anchor's marker target (join back on the
            # deterministic row id — pair-table-sized)
            mapped, gpts = binoc
            tgt = gpts.select("user_id", "event_id", "gx", "gy")
            m = mapped.join(tgt, ["user_id", "event_id"])
            ex = (F.col("gaze_x") - F.col("gx")) * P.DEG_HORIZ
            ey = (F.col("gaze_y") - F.col("gy")) * P.DEG_VERT
            return m.select(
                "user_id",
                F.col("t_out").alias("t"),
                F.col("gx").alias("mx"),
                F.col("gy").alias("my"),
                F.sqrt(ex * ex + ey * ey).alias("err"),
            )
        g = paired()
        fit = calibration_linear_points(
            g.select(
                "user_id", "t", "px", "py",
                F.col("mx").alias("gx"), F.col("my").alias("gy"),
            )
        ).select("user_id", "slope_x", "intercept_x", "slope_y",
                 "intercept_y")
        m = g.join(F.broadcast(fit), "user_id")
        ex = (
            F.col("intercept_x") + F.col("slope_x") * F.col("px")
            - F.col("mx")
        ) * P.DEG_HORIZ
        ey = (
            F.col("intercept_y") + F.col("slope_y") * F.col("py")
            - F.col("my")
        ) * P.DEG_VERT
        return m.select(
            "user_id", "t", "mx", "my",
            F.sqrt(ex * ex + ey * ey).alias("err"),
        )

    for name in steps:
        pr = resolve(name)
        if pr.step == "pupil":
            if "eye" in eye_frames.columns:
                # per-eye detection streams for binocular chains; the
                # combined (union) stream keeps monocular glue working
                pup_by_eye = {
                    e: pr(eye_frames.where(F.col("eye") == e))
                    for e in (0, 1)
                }
                pup = pup_by_eye[0].unionByName(pup_by_eye[1])
            else:
                pup = pr(eye_frames)
            out[name] = pup
        elif pr.step == "marker":
            det = pr(world_frames)
            for c in ("corner_xs", "corner_ys"):
                if c in det.columns:
                    det = det.drop(c)
            out[name] = det
        elif pr.step == "marker_parsing":
            if det is None:
                raise ValueError(
                    f"{name!r} needs a marker step earlier in the chain"
                )
            out[name] = pr(detections_to_marker_stream(det))
        elif pr.step == "calibration":
            if pr.fn is gaze_map_binocular:
                gpts = iter_checkpoint(binocular_points(), eager=False)
                mapped = gaze_map_binocular_points(gpts, **pr.kwargs)
                out[name] = mapped
                out["_binocular_points"] = gpts
                binoc = (mapped, gpts)
                continue
            face = _points_face(pr.fn)
            if face is None:
                raise NotImplementedError(
                    f"{name!r} has no point-table face"
                )
            g = paired()
            out[name] = face(
                g.select(
                    "user_id", "t", "px", "py",
                    F.col("mx").alias("gx"), F.col("my").alias("gy"),
                ),
                **pr.kwargs,
            )
        elif pr.step == "gaze":
            out[name] = calibration_linear_points(
                paired().select(
                    "user_id", "t", "px", "py",
                    F.col("mx").alias("gx"), F.col("my").alias("gy"),
                )
            )
        elif pr.step == "error":
            from vedb_gaze_spark.operators.error import (
                error_surface_tps_cv_points,
            )

            err_face = (
                error_surface_tps_cv_points
                if pr.fn is error_surface_tps_cv
                else error_surface_tps_points
            )
            out[name] = err_face(mapped_error(), **pr.kwargs)
        else:  # pragma: no cover — every registered step is handled
            raise KeyError(f"unhandled step kind {pr.step!r} for {name!r}")
    return out
