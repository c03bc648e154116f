"""Signal smoothing operators.

Re-expresses labeling.py:773 ``detrend_median`` (rolling-median detrend)
and odometry.py:27's Savitzky-Golay smoothing (scipy.signal.savgol_filter
with window_length, polyorder=2).

Savgol over a fixed window is just a convolution with closed-form
coefficients, so it compiles to a lag/lead weighted sum — whole-stage
codegen, no UDF, no scipy. The 7-point quadratic kernel is
(-2, 3, 6, 7, 6, 3, -2)/21 (classic Savitzky-Golay table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vedb_gaze_spark.operators.temporal import with_tsec
from vedb_gaze_spark.plans import params as P

SAVGOL_7_2 = (-2.0, 3.0, 6.0, 7.0, 6.0, 3.0, -2.0)  # /21


def detrend_median(events: DataFrame, window_s: float = P.DETREND_WINDOW_S) -> DataFrame:
    """detrend_median (labeling.py:773): subtract the rolling median over a
    ±window/2-second RANGE frame, per user. Median over a range window is
    an order-statistic — exact, engine-independent."""
    half_us = int(window_s * 1_000_000) // 2  # integer-micros RANGE frame
    w = Window.partitionBy("user_id").orderBy("t_us").rangeBetween(-half_us, half_us)
    e = events.select("user_id", "event_id", F.unix_micros("ts").alias("t_us"), "value")
    # Spark forbids median() over a framed window; an order-statistic pick
    # from the sorted frame contents is the same number (and interpolates
    # even-sized frames identically: (lo+hi)/2). Frame size is bounded by
    # the time window, so the per-row array is small at any data scale.
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    hi = F.element_at(vals, (n / 2).cast("int") + 1)
    med = (lo + hi) / 2.0
    return e.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - med, 6).alias("detrended"),
    )


def smooth_savgol(events: DataFrame) -> DataFrame:
    """Savitzky-Golay smoothing as used on odometry streams
    (odometry.py:27, savgol_filter(window_length, polyorder=2)); 7-point
    quadratic kernel as an explicit lag/lead weighted sum. Interior points
    only (all 6 neighbors must exist), matching scipy's 'interp' edge mode
    being irrelevant for our use."""
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    e = with_tsec(events).select("user_id", "event_id", "t", "value")
    c = SAVGOL_7_2
    expr = (
        c[0] * F.lag("value", 3).over(w)
        + c[1] * F.lag("value", 2).over(w)
        + c[2] * F.lag("value", 1).over(w)
        + c[3] * F.col("value")
        + c[4] * F.lead("value", 1).over(w)
        + c[5] * F.lead("value", 2).over(w)
        + c[6] * F.lead("value", 3).over(w)
    ) / 21.0
    return (
        e.withColumn("smoothed", expr)
        .where(F.col("smoothed").isNotNull())
        .select("user_id", "event_id", F.round("smoothed", 6).alias("smoothed"))
    )
