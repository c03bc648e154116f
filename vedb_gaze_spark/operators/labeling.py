"""Event labeling operators — blinks, saccades, rates, orientation.

Re-expresses vedb_gaze/labeling.py: ``compute_eye_velocity`` (:128),
``find_saccades`` (:615), ``detect_blinks_confidence`` (:444),
``get_saccade_rate`` (:508), and odometry.py's quaternion → euler
conversion (euler_from_quaternion, used at odometry.py:100).

All are lag-window + gaps-and-islands algebra per user: one shuffle each,
reference's Python loops replaced by whole-stage-codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vedb_gaze_spark.operators.temporal import with_tsec
from vedb_gaze_spark.plans import params as P
from vedb_gaze_spark.sources.signals import with_gaze


def eye_velocity(events: DataFrame) -> DataFrame:
    """compute_eye_velocity (labeling.py:128): gaze positions scaled to
    degrees, euclidean step distance / dt against the previous sample."""
    g = with_gaze(events)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    dx = (F.col("gx") - F.lag("gx").over(w)) * P.DEG_HORIZ
    dy = (F.col("gy") - F.lag("gy").over(w)) * P.DEG_VERT
    dt = F.col("t") - F.lag("t").over(w)
    vel = F.sqrt(dx * dx + dy * dy) / dt
    return (
        g.withColumn("vel", vel)
        .withColumn("dt", dt)
        .where(F.col("vel").isNotNull() & (F.col("dt") > 0))
        .select("user_id", "event_id", F.round("vel", 6).alias("vel_deg_s"))
    )


def _velocity_runs(events: DataFrame, threshold: float, above: bool = True):
    """Maximal runs of super- (above=True) or sub-threshold velocity via
    gaps-and-islands; rows with undefined velocity (first sample per user)
    never flag either way."""
    g = with_gaze(events)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    dx = (F.col("gx") - F.lag("gx").over(w)) * P.DEG_HORIZ
    dy = (F.col("gy") - F.lag("gy").over(w)) * P.DEG_VERT
    dt = F.col("t") - F.lag("t").over(w)
    vel = F.col("vel")
    cond = (vel > threshold) if above else (vel <= threshold)
    g = g.withColumn("vel", F.sqrt(dx * dx + dy * dy) / dt).withColumn(
        "flag", cond.cast("int")
    )
    g = g.withColumn("rn", F.row_number().over(w))
    runs = g.where(F.col("flag") == 1).withColumn(
        "grp", F.col("rn") - F.row_number().over(w)
    )
    return runs


def detect_saccades(
    events: DataFrame,
    threshold: float = P.SACCADE_VEL_THRESHOLD,
    min_s: float = P.SACCADE_MIN_S,
    max_s: float = P.SACCADE_MAX_S,
) -> DataFrame:
    """find_saccades (labeling.py:615): maximal runs of super-threshold
    velocity, bounded by duration, with per-saccade peak velocity and
    amplitude (distance from run start to run end position in degrees)."""
    runs = _velocity_runs(events, threshold)
    gx0 = F.min_by("gx", "rn")
    gy0 = F.min_by("gy", "rn")
    gx1 = F.max_by("gx", "rn")
    gy1 = F.max_by("gy", "rn")
    out = (
        runs.groupBy("user_id", "grp")
        .agg(
            F.min("event_id").alias("start_event_id"),
            F.max("event_id").alias("end_event_id"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max("t") - F.min("t")).alias("duration_s"),
            F.round(F.max("vel"), 6).alias("peak_vel"),
            F.round(
                F.sqrt(
                    ((gx1 - gx0) * P.DEG_HORIZ) * ((gx1 - gx0) * P.DEG_HORIZ)
                    + ((gy1 - gy0) * P.DEG_VERT) * ((gy1 - gy0) * P.DEG_VERT)
                ),
                6,
            ).alias("amplitude_deg"),
        )
        .where((F.col("duration_s") >= min_s) & (F.col("duration_s") <= max_s))
        .drop("grp")
    )
    return out


def detect_fixations(
    events: DataFrame,
    threshold: float = P.SACCADE_VEL_THRESHOLD,
    min_s: float = P.FIXATION_MIN_S,
    max_s: float = P.FIXATION_MAX_S,
    max_extent_deg: float = P.FIXATION_MAX_EXTENT_DEG,
) -> DataFrame:
    """Fixation detection — the third event class beside saccades and
    blinks, and the one downstream analyses actually consume.

    The reference declares the capability but leaves it unimplemented
    (labeling.py:529 find_fixation_breaks is a pass stub; pipelines wire
    saccade output toward it). Standard dispersion-threshold semantics,
    as the complement of find_saccades (labeling.py:615): maximal runs of
    SUB-threshold eye velocity, gated by duration bounds and a
    position-stability cap (bounding-box diagonal extent in degrees),
    with per-fixation centroid. Same single-shuffle gaps-and-islands
    algebra as detect_saccades — one sorted window per user partition,
    then one aggregation."""
    runs = _velocity_runs(events, threshold, above=False)
    ex_deg = (F.max("gx") - F.min("gx")) * P.DEG_HORIZ
    ey_deg = (F.max("gy") - F.min("gy")) * P.DEG_VERT
    out = (
        runs.groupBy("user_id", "grp")
        .agg(
            F.min("event_id").alias("start_event_id"),
            F.max("event_id").alias("end_event_id"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max("t") - F.min("t")).alias("duration_s"),
            F.round(F.avg("gx") * P.DEG_HORIZ, 6).alias("centroid_x_deg"),
            F.round(F.avg("gy") * P.DEG_VERT, 6).alias("centroid_y_deg"),
            F.round(F.sqrt(ex_deg * ex_deg + ey_deg * ey_deg), 6).alias("extent_deg"),
        )
        .where(
            (F.col("duration_s") >= min_s)
            & (F.col("duration_s") <= max_s)
            & (F.col("extent_deg") <= max_extent_deg)
        )
        .drop("grp")
    )
    return out


def detect_blinks(
    events: DataFrame,
    conf_threshold: float = P.BLINK_CONF_THRESHOLD,
    min_s: float = P.BLINK_MIN_S,
    max_s: float = P.BLINK_MAX_S,
) -> DataFrame:
    """detect_blinks_confidence (labeling.py:444): maximal runs of
    sub-threshold confidence whose duration falls inside the blink bounds.
    """
    g = with_gaze(events)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    g = g.withColumn("rn", F.row_number().over(w))
    runs = g.where(F.col("conf") < conf_threshold).withColumn(
        "grp", F.col("rn") - F.row_number().over(w)
    )
    return (
        runs.groupBy("user_id", "grp")
        .agg(
            F.min("event_id").alias("start_event_id"),
            F.max("event_id").alias("end_event_id"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max("t") - F.min("t")).alias("duration_s"),
        )
        .where((F.col("duration_s") >= min_s) & (F.col("duration_s") <= max_s))
        .drop("grp")
    )


def saccade_rate(
    events: DataFrame, flag_type: str = "click", window_s: float = P.RATE_WINDOW_S
) -> DataFrame:
    """get_saccade_rate (labeling.py:508): sliding-window event rate. At
    each flagged event, the count of flagged events per hour inside a
    centered window — an integer-micros RANGE frame, no join."""
    half_us = int(window_s * 1_000_000) // 2
    e = (
        with_tsec(events)
        .where(F.col("event_type") == flag_type)
        .select("user_id", "event_id", F.unix_micros("ts").alias("t_us"))
    )
    w = Window.partitionBy("user_id").orderBy("t_us").rangeBetween(-half_us, half_us)
    rate = F.count(F.lit(1)).over(w) / F.lit(window_s / 3600.0)
    return e.select("user_id", "event_id", F.round(rate, 6).alias("rate_per_hour"))


def euler_cols(qw, qx, qy, qz) -> tuple:
    """euler_from_quaternion (odometry.py:176) as Column algebra:
    normalize, then roll/pitch/yaw via the standard atan2/asin
    formulas with the asin argument clamped (the reference's +1/-1
    saturation) — all JVM-side trig. Shared by the synthetic-quat
    registry face and the capture-stream path (ODOMETRY_FIELDS'
    quat_w..quat_z columns)."""
    nrm = F.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    w, x, y, z = qw / nrm, qx / nrm, qy / nrm, qz / nrm
    roll = F.atan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = F.asin(F.greatest(F.least(2.0 * (w * y - x * z), F.lit(1.0)), F.lit(-1.0)))
    yaw = F.atan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return roll, pitch, yaw


def quat_to_euler(events: DataFrame) -> DataFrame:
    """euler_from_quaternion as used on odometry orientation streams
    (odometry.py:100: ori_ang = euler_from_quaternion(*orientation.T)).
    Quaternion components derived deterministically from event_id
    (integer arithmetic, cross-engine exact); angle algebra shared
    with the capture path via euler_cols."""
    k = F.col("event_id")
    qw = (k * 7877) % 1000 / 1000.0 + 0.5
    qx = ((k * 104917) % 1000 - 500) / 500.0
    qy = ((k * 15485863) % 1000 - 500) / 500.0
    qz = ((k * 32452843) % 1000 - 500) / 500.0
    roll, pitch, yaw = euler_cols(qw, qx, qy, qz)
    return events.select(
        "event_id",
        F.round(roll, 6).alias("roll"),
        F.round(pitch, 6).alias("pitch"),
        F.round(yaw, 6).alias("yaw"),
    )
