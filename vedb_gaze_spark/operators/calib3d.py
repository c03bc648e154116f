"""3-D calibration (SURVEY §2.D extension).

Re-expresses ``calibrate_monocular`` / ``calibrate_binocular``
(externals/calibrate_3d.py:103/:40): solve for the eye camera's
ORIENTATION so its pupil normals line up with the unprojected reference
directions, and report the residual alignment error.

The reference delegates the refinement to an external bundle-adjustment
package (`bundle_adjustment.BundleAdjustment`, a scipy least-squares
dependency not vendored in the repo and absent from this container); its
own initialization step (`utils.get_initial_eye_camera_rotation`,
calibrate_3d.py:59) is the closed-form orthogonal-Procrustes/Kabsch
alignment between the two direction bundles — that closed form IS the
least-squares-optimal rotation for the spherical-camera residual with
fixed targets, so we implement it exactly (one SVD per session) and
report the same angular residual the bundle adjustment would minimize.

The test tables carry no 3-D normals, so reference directions derive
deterministically from event_id (azimuth/elevation integer math) and
pupil normals are those directions pushed through a fixed ground-truth
rotation plus deterministic jitter — the operator must recover the
rotation. Per-user bounded groups via applyInPandas; rows-only oracle
(SVD is not SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vedb_gaze_spark.functions.grouped import apply_per_key
from vedb_gaze_spark.operators.temporal import with_tsec

# fixed ground-truth eye rotation: 15° about a fixed axis (literal)
_ANGLE = np.deg2rad(15.0)
_AXIS = np.array([0.267261, 0.534522, 0.801784])  # normalized (1,2,3)


def _rot(axis: np.ndarray, angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    x, y, z = axis
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return np.eye(3) + s * K + (1 - c) * (K @ K)


_R_TRUE = _rot(_AXIS, _ANGLE)

_C3D_SCHEMA = (
    "user_id bigint, n_points int, residual_deg double, "
    "roll double, pitch double, yaw double, success boolean"
)
_RESIDUAL_THRESHOLD_DEG = 3.0


def _ref_dirs(events: DataFrame) -> DataFrame:
    """Unit reference directions from integer event_id math (both
    engines would derive identical values; only numpy consumes them)."""
    k = F.col("event_id")
    az = ((k * 104723) % 360).cast("double") * float(np.pi / 180.0)
    el = (((k * 15493) % 120) - 60).cast("double") * float(np.pi / 180.0)
    jx = (((k * 7321) % 21) - 10).cast("double") / 2000.0
    jy = (((k * 9973) % 21) - 10).cast("double") / 2000.0
    jz = (((k * 3947) % 21) - 10).cast("double") / 2000.0
    return with_tsec(events).select(
        "user_id",
        "event_id",
        (F.cos(el) * F.cos(az)).alias("rx"),
        (F.cos(el) * F.sin(az)).alias("ry"),
        F.sin(el).alias("rz"),
        jx.alias("jx"),
        jy.alias("jy"),
        jz.alias("jz"),
    )


def calibration_3d(events: DataFrame) -> DataFrame:
    """Per-user 3-D eye-orientation calibration: Kabsch-align jittered
    pupil normals to reference directions, report the rotation (euler)
    and mean angular residual, success-gated like the reference
    (calibrate_3d.py:100 residual < threshold)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        R = pdf[["rx", "ry", "rz"]].to_numpy()
        J = pdf[["jx", "jy", "jz"]].to_numpy()
        # pupil normals: ground-truth rotation of the ref dirs + jitter
        P = R @ _R_TRUE.T + J
        P = P / np.linalg.norm(P, axis=1, keepdims=True)
        H = P.T @ R
        U, _, Vt = np.linalg.svd(H)
        d = np.sign(np.linalg.det(Vt.T @ U.T))
        D = np.diag([1.0, 1.0, d])
        R_est = Vt.T @ D @ U.T  # maps pupil normals -> ref dirs
        aligned = P @ R_est.T
        cosang = np.clip((aligned * R).sum(1), -1.0, 1.0)
        residual = float(np.rad2deg(np.arccos(cosang)).mean())
        # ZYX euler of R_est
        pitch = float(np.arcsin(np.clip(-R_est[2, 0], -1.0, 1.0)))
        roll = float(np.arctan2(R_est[2, 1], R_est[2, 2]))
        yaw = float(np.arctan2(R_est[1, 0], R_est[0, 0]))
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_points": [len(pdf)],
                "residual_deg": [round(residual, 6)],
                "roll": [round(roll, 6)],
                "pitch": [round(pitch, 6)],
                "yaw": [round(yaw, 6)],
                "success": [residual < _RESIDUAL_THRESHOLD_DEG],
            }
        )

    return apply_per_key(_ref_dirs(events), "user_id", run, _C3D_SCHEMA)
