"""Odometry kinematics (SURVEY §2.F extension).

Re-expresses the derived-quantity path of ``load_odometry``
(odometry.py:26): the head-tracker position stream becomes linear speed
(the ``absolute_linear_velocity`` = np.linalg.norm(linear_velocity)
computation at odometry.py:96, here derived from positions as a lag
window) plus ``convert_speed`` (odometry.py:197) unit conversions.
Savgol smoothing, quat→euler, and the vector norm of the velocity column
are already separate operators (smooth_savgol, quat_to_euler,
vector_norm); this covers the position→speed derivation the VERDICT
flagged as unported.

The test tables carry no position columns, so a 3-D position is derived
deterministically from event_id with integer arithmetic (the signals.py
convention) — both engines compute bit-identical inputs, making the
operator fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vedb_gaze_spark.operators.temporal import with_tsec

M_PER_MILE = 1609.34
SEC_PER_HR = 3600.0


def _r6(c):
    """6dp rounding as floor(x*1e6+0.5)/1e6 — engine-portable identical
    IEEE ops on Spark and DuckDB (see speed_from_positions)."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _positions(events: DataFrame) -> DataFrame:
    k = F.col("event_id")
    px = ((k * 48271) % 2000 - 1000) / 100.0
    py = ((k * 69621) % 2000 - 1000) / 100.0
    pz = ((k * 16807) % 400) / 100.0
    return with_tsec(events).select(
        "user_id", "event_id", "t", px.alias("x"), py.alias("y"), pz.alias("z")
    )


def odometry_speed(events: DataFrame) -> DataFrame:
    """Per-user linear speed from consecutive positions (meters assumed),
    with convert_speed's mph and minutes-per-mile views. One sorted
    window per user partition — the same single-shuffle lag algebra as
    eye_velocity."""
    return speed_from_positions(_positions(events))


def speed_from_positions(p: DataFrame) -> DataFrame:
    """The position→speed core over REAL columns (user_id, event_id, t,
    x, y, z) — what a capture-fed pipeline calls after read_pldata with
    ODOMETRY_FIELDS (the load_odometry position stream, odometry.py:58);
    the registry face feeds it the deterministic synthetic positions so
    the algebra stays oracle-checkable."""
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    dx = F.col("x") - F.lag("x").over(w)
    dy = F.col("y") - F.lag("y").over(w)
    dz = F.col("z") - F.lag("z").over(w)
    dt = F.col("t") - F.lag("t").over(w)
    mps = F.sqrt(dx * dx + dy * dy + dz * dz) / dt
    out = p.withColumn("mps", mps).withColumn("dt", F.col("t") - F.lag("t").over(w))
    return (
        out.where(F.col("mps").isNotNull() & (F.col("dt") > 0))
        .select(
            "user_id",
            "event_id",
            # floor(x*1e6+0.5), not round(x, 6): Spark's BigDecimal
            # HALF_UP on the double's binary expansion disagrees with
            # DuckDB round() on .5-boundary doubles — one sf0.1 row's
            # mins_per_mile sat exactly on the 6dp grid (found by the
            # r14 all-keys sf0.1 sweep; invisible at the sf0.01 gate).
            # The floor form runs identical IEEE ops on both engines.
            _r6(F.col("mps")).alias("speed_mps"),
            _r6(F.col("mps") * SEC_PER_HR / M_PER_MILE).alias("speed_mph"),
            # minutes-per-mile is undefined at zero speed (a stationary
            # sample: consecutive identical positions with dt > 0) —
            # NULL on both engines instead of ANSI DIVIDE_BY_ZERO.
            # Found by the r14 full-registry bench at sf0.1; zero-speed
            # pairs never occur at the sf0.01 gate, so the gate output
            # is unchanged.
            F.when(
                F.col("mps") > 0,
                _r6(M_PER_MILE / F.col("mps") / 60.0),
            ).alias("mins_per_mile"),
        )
    )
