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


def streaming_dedup_exact(
    documents: DataFrame,
    watermark_s: float = 7 * 86400.0,
) -> DataFrame:
    """Streaming twin of operators/dedup.py:dedup_exact — emit each
    distinct document content exactly once as it first arrives.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per content
    hash and expires it once the event-time watermark passes, so state is
    bounded by the dedup horizon instead of the stream's full history —
    the standard incremental form of exact dedup for a training-data
    ingest pipeline. The documents table carries no timestamp, so event
    time derives deterministically from doc_id (ingest order). Which
    duplicate row survives depends on stream arrival order; the
    deterministic contract (and what tests compare) is the SET of
    distinct content hashes. Batch DataFrames take a plain distinct."""
    hashed = documents.select(
        "doc_id",
        # 2024-01-01 base: a doc_id-0 ts of exactly the epoch would equal
        # the stream's initial watermark and be dropped as late
        F.timestamp_micros((F.lit(1_704_067_200) + F.col("doc_id")) * 1_000_000).alias("ts"),
        F.md5(F.col("text")).alias("content_hash"),
    )
    if documents.isStreaming:
        return (
            hashed.withWatermark("ts", f"{int(watermark_s)} seconds")
            .dropDuplicatesWithinWatermark(["content_hash"])
            .select("content_hash", "doc_id")
        )
    return (
        hashed.groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )


def streaming_dau(events: DataFrame) -> DataFrame:
    """Incremental daily-active-users: twin of analytics.dau_rollup's
    DAU branch. Cross-batch distinctness comes from
    dropDuplicatesWithinWatermark on (user_id, day_idx) — state holds
    one tombstone per user-day inside the 40-day horizon, evicted by
    the watermark, so state is bounded by active-users × horizon no
    matter how long the stream runs. The count itself is an update-mode
    aggregation keyed by day."""
    from vedb_gaze_spark.operators.analytics import _DAY_US

    d = (
        events.withWatermark("ts", "40 days")
        .selectExpr("ts", "user_id", f"unix_micros(ts) DIV {_DAY_US} AS day_idx")
        .dropDuplicatesWithinWatermark(["user_id", "day_idx"])
    )
    return d.groupBy("day_idx").agg(F.count(F.lit(1)).alias("dau"))


def streaming_hll_registers(events: DataFrame) -> DataFrame:
    """Incremental HyperLogLog register maintenance — the streaming half
    of corpus.hll_distinct. HLL registers are MERGEABLE state (max per
    register), so the stream needs no dedup and no watermark: each
    micro-batch folds into 512 maxes per event_type, state is
    m × groups scalars forever, and the batch estimate formula reads
    the registers at any time. Emits (event_type, idx, mx) — the
    estimate head stays in the batch operator so stream and batch share
    one arithmetic definition."""
    from vedb_gaze_spark.functions.core import portable_hash60
    from vedb_gaze_spark.plans import params as P

    h = portable_hash60(F.col("user_id").cast("string"))
    rb = P.HLL_RANK_BITS
    return (
        events.select(
            "event_type",
            (h % P.HLL_M).alias("idx"),
            F.shiftright(h, P.HLL_P).alias("w"),
        )
        .withColumn(
            "rank",
            F.when(F.col("w") == 0, F.lit(rb + 1)).otherwise(
                F.lit(rb + 1) - F.length(F.bin(F.col("w")))
            ),
        )
        .groupBy("event_type", "idx")
        .agg(F.max("rank").alias("mx"))
    )
