"""Structured Streaming twins of the batch temporal operators (SURVEY §2.I).

The reference processes sessions as static recordings; a live deployment
of the same pipeline consumes the gaze/event stream incrementally. These
operators express the batch semantics as incremental plans:

- ``streaming_sessionize``: session_window(gap) + watermark — the
  streaming twin of operators/clustering.py:sessionize
  (split_timecourse, marker_parsing.py:187). State is bounded by the
  watermark: late events beyond it are dropped, sessions finalize when
  the watermark passes gap.
- ``streaming_rate``: tumbling-window per-type counts — the streaming
  twin of labeling.py:saccade_rate.

Both run on any streaming source; tests drive them with a file source
over the test parquet and Trigger.AvailableNow, then check equality with
the batch plan on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vedb_gaze_spark.plans import params as P


def streaming_sessionize(
    events: DataFrame,
    gap_s: float = P.SESSION_GAP_S,
    watermark_s: float = 7 * 86400.0,
) -> DataFrame:
    """Gap-based sessions over a stream: one row per closed session per
    user. Works identically on a batch DataFrame (session_window is a
    regular grouping expression), which is how tests cross-check it."""
    gap = f"{int(gap_s)} seconds"
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", f"{int(watermark_s)} seconds")
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_rate(
    events: DataFrame,
    window_s: float = 86400.0,
    watermark_s: float = 7 * 86400.0,
) -> DataFrame:
    """Tumbling-window event counts per type — incremental aggregation
    with map-side partials; watermark bounds state."""
    win = f"{int(window_s)} seconds"
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", f"{int(watermark_s)} seconds")
    return (
        src.groupBy(F.window("ts", win).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
