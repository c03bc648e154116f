"""Streaming twin of the bucketed point-in-interval range join
(operators/temporal.py:interval_join), built on Structured Streaming's
native stream-stream inner join with event-time bounds — the one
streaming construct none of the applyInPandasWithState twins needed.

Shape: the SAME input stream is split into points and intervals (every
``error`` event opens a [t, t+w) window — a self-join), both sides are
keyed by the batch operator's time bucket (width = window length, so an
interval explodes to ≤2 bucket rows and a point lives in exactly one),
and the join is an EQUI-join on the bucket refined by the containment
predicate. Without the bucket key a time-range-only stream-stream join
degenerates to comparing every buffered row against every arriving row;
with it, state is hash-partitioned by a time-uniform key — the same
argument as the batch plan, carried over to the state store.

Both sides carry watermarks, and the join condition bounds the event
times relative to each other, so Spark can evict interval state once
points can no longer arrive for it — bounded state on an unbounded
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vedb_gaze_spark.plans import params as P


def streaming_interval_join(
    events: DataFrame,
    w_s: float = P.INTERVAL_W_S,
    watermark: str = "2 hours",
) -> DataFrame:
    """(incident_id, event_id, user_id, event_type, lag_us) pairs,
    emitted as both sides of each containment arrive. Parity with the
    batch operator's pair multiset is pinned in tests/test_streaming.py
    (late rows beyond the watermark are dropped by contract — the test
    runs an ordered replay inside the watermark)."""
    b_us = int(w_s * 1_000_000)
    pts = (
        events.withWatermark("ts", watermark)
        .select(
            F.col("event_id"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("ts").alias("p_ts"),
            F.unix_micros("ts").alias("ts_us"),
        )
        .withColumn("bucket", F.floor(F.col("ts_us") / F.lit(b_us)))
    )
    iv = (
        events.where(F.col("event_type") == "error")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("i_ts"),
            F.unix_micros("ts").alias("t0_us"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("t0_us") / F.lit(b_us)),
                    F.floor((F.col("t0_us") + F.lit(b_us) - 1) / F.lit(b_us)),
                )
            ),
        )
    )
    cond = (
        (pts["bucket"] == iv["bucket"])
        & (pts["p_ts"] >= iv["i_ts"])
        & (pts["p_ts"] < iv["i_ts"] + F.expr(f"INTERVAL {int(w_s)} SECONDS"))
    )
    return (
        pts.join(iv, cond, "inner")
        .select(
            "incident_id",
            "event_id",
            "user_id",
            "event_type",
            (F.col("ts_us") - F.col("t0_us")).alias("lag_us"),
        )
    )
