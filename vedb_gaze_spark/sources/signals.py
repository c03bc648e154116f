"""Derived gaze-signal view over the events table.

The reference pipeline's pupil/gaze/marker streams carry norm_pos (0-1
screen coordinates) and confidence (vedb_gaze/pupil_detection_pl.py,
calibration.py:45 parse_plab_data). The driver's test tables have no such
columns, so we derive them deterministically from event_id with INTEGER
arithmetic only — both engines compute bit-identical values, making every
downstream gaze operator (calibration, error, labeling) oracle-checkable.

    px,py   pupil position in [0,1)            (hash-like spread)
    mx,my   marker/target position in [0.1,0.9)
    gx,gy   gaze estimate = marker + small deterministic error
    conf    pupil confidence in [0,1)

The SQL twin is oracles.GAZE_CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vedb_gaze_spark.functions.core import tsec


def with_gaze(events: DataFrame) -> DataFrame:
    k = F.col("event_id")
    px = (k * 2654435761) % 1000 / 1000.0
    py = (k * 40503) % 1000 / 1000.0
    mx = 0.1 + 0.8 * px
    my = 0.1 + 0.8 * py
    gx = mx + ((k * 9176) % 21 - 10) / 500.0
    gy = my + ((k * 7919) % 21 - 10) / 500.0
    conf = (k * 104729) % 100 / 100.0
    return events.select(
        "event_id",
        "user_id",
        tsec("ts").alias("t"),
        px.alias("px"),
        py.alias("py"),
        mx.alias("mx"),
        my.alias("my"),
        gx.alias("gx"),
        gy.alias("gy"),
        conf.alias("conf"),
    )
