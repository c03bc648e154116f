"""The composed end-to-end gaze pipeline as ONE declarative plan.

The reference wires its stages through a pydra DAG (vedb_gaze/pipelines.py:
pupil detection → calibration → gaze mapping → error → labeling), writing
intermediates to disk between steps. Here the whole chain is a single
DataFrame expression: Catalyst sees every stage at once, so the
calibration-fit aggregation, the mapped-gaze projection, the error
algebra, and the labeling windows share one scan of the events table and
one user_id partitioning — no intermediate materialization at any scale.

Stages (all SQL-expressible, so the full pipeline is oracle-checked):
1. signal derivation + confidence gate  (sources/signals.py)
2. per-user linear calibration fit       (operators/calibration.py:
   Calibration.fit, calibration.py:468)
3. gaze mapping: apply fit to all rows   (gaze_mapping.py:2 gaze_mapper)
4. pointwise error in degrees            (error_computation.py:18)
5. labeling: blink samples + velocity    (labeling.py:444,:128)
6. per-user session summary              (the pipeline's QC report)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vedb_gaze_spark.plans import params as P
from vedb_gaze_spark.sources.signals import with_gaze


def gaze_pipeline(events: DataFrame) -> DataFrame:
    """Per-user end-to-end QC summary: calibration fit quality, mapped
    gaze error in degrees, blink-sample share, median eye velocity."""
    g = with_gaze(events)

    # 2. calibration fit on confident samples only (parse_plab_data's
    # min_calibration_confidence gate, calibration.py:58)
    conf_ok = g.where(F.col("conf") > P.MIN_CONFIDENCE)
    fit = conf_ok.groupBy("user_id").agg(
        F.regr_slope("gx", "px").alias("bx"),
        F.regr_intercept("gx", "px").alias("ax"),
        F.regr_slope("gy", "py").alias("by"),
        F.regr_intercept("gy", "py").alias("ay"),
        F.count(F.lit(1)).alias("n_calib"),
    )

    # 3. map EVERY sample through the per-user fit (one equi join on the
    # partition key; the fit side is tiny per user)
    m = g.join(fit, "user_id")
    est_x = F.col("ax") + F.col("bx") * F.col("px")
    est_y = F.col("ay") + F.col("by") * F.col("py")

    # 4. pointwise error vs the marker position, in degrees
    err_deg = F.sqrt(
        ((est_x - F.col("mx")) * P.DEG_HORIZ) * ((est_x - F.col("mx")) * P.DEG_HORIZ)
        + ((est_y - F.col("my")) * P.DEG_VERT) * ((est_y - F.col("my")) * P.DEG_VERT)
    )

    # 5. labeling signals on the same rows
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    dx = (F.col("gx") - F.lag("gx").over(w)) * P.DEG_HORIZ
    dy = (F.col("gy") - F.lag("gy").over(w)) * P.DEG_VERT
    dt = F.col("t") - F.lag("t").over(w)
    vel = F.sqrt(dx * dx + dy * dy) / dt
    labeled = m.withColumn("err_deg", err_deg).withColumn("vel", vel).withColumn(
        "is_blink", (F.col("conf") < P.BLINK_CONF_THRESHOLD).cast("int")
    )

    # 6. one QC row per user
    return labeled.groupBy("user_id").agg(
        F.min("n_calib").alias("n_calib"),
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.sqrt(F.avg(F.col("err_deg") * F.col("err_deg"))), 6).alias("rmse_deg"),
        F.round(F.median("err_deg"), 6).alias("median_err_deg"),
        F.round(F.avg("is_blink"), 6).alias("blink_frac"),
        F.round(F.median("vel"), 6).alias("median_vel_deg_s"),
    )
