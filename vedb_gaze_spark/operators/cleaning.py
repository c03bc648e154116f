"""Cleaning & outlier-removal operators.

Re-expresses vedb_gaze/utils.py:545 ``remove_outliers``,
marker_parsing.py:8 ``find_duplicates``, :53 ``remove_brief_detections``,
:114 ``remove_small_detections`` and :31 ``_bimodality_check``.

Everything is window/aggregate algebra inside a user_id partition — one
shuffle each, no Python on the hot path. The bimodality check is an EXACT
1-D 2-means (prefix-sum argmin over the sorted values) instead of the
reference's randomly-initialized sklearn k_means: deterministic, optimal,
and expressible as pure window SQL at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vedb_gaze_spark.operators.temporal import with_tsec
from vedb_gaze_spark.plans import params as P


def outliers_z(
    events: DataFrame,
    z_threshold: float = P.Z_THRESHOLD,
    absolute_min: float = P.ABS_MIN,
    absolute_max: float = P.ABS_MAX,
) -> DataFrame:
    """remove_outliers (utils.py:545): z-score (population std, matching
    scipy.stats.zscore's ddof=0) + absolute bounds, per user. The stats are
    unordered window aggregates — map-side partials, one shuffle."""
    w = Window.partitionBy("user_id")
    e = events.select("user_id", "event_id", "value").withColumn(
        "mu", F.avg("value").over(w)
    ).withColumn("sigma", F.stddev_pop("value").over(w))
    keep = (
        (F.col("value") >= absolute_min)
        & (F.col("value") <= absolute_max)
        & (F.abs((F.col("value") - F.col("mu")) / F.col("sigma")) < z_threshold)
    )
    return e.where(keep).select("user_id", "event_id", "value")


def dedup_timestamps(events: DataFrame) -> DataFrame:
    """find_duplicates mode='all' (marker_parsing.py:8): drop EVERY row
    whose (user_id, ts) occurs more than once — the reference treats any
    frame with two detections as spurious and keeps neither."""
    w = Window.partitionBy("user_id", "ts")
    return (
        events.withColumn("n_at_ts", F.count(F.lit(1)).over(w))
        .where(F.col("n_at_ts") == 1)
        .select("user_id", "event_id", F.unix_micros("ts").alias("t_us"))
    )


def brief_detections(
    events: DataFrame,
    flag_type: str = "error",
    gap_s: float = P.SESSION_GAP_S,
    min_duration_s: float = P.BRIEF_MIN_S,
) -> DataFrame:
    """remove_brief_detections (marker_parsing.py:53): drop duplicate
    timestamps, group detections into contiguous episodes (gap > gap_s
    splits), and keep only episodes longer than min_duration_s. Returns the
    surviving detection rows. Two window passes over ONE user_id shuffle.
    """
    det = with_tsec(events).where(F.col("event_type") == flag_type)
    wts = Window.partitionBy("user_id", "t")
    det = det.withColumn("n_at_ts", F.count(F.lit(1)).over(wts)).where(F.col("n_at_ts") == 1)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    lag_t = F.lag("t").over(w)
    det = det.withColumn(
        "new_epoch",
        F.when(lag_t.isNull() | (F.col("t") - lag_t > gap_s), 1).otherwise(0),
    ).withColumn("epoch", F.sum("new_epoch").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ))
    we = Window.partitionBy("user_id", "epoch")
    return (
        det.withColumn("dur", F.max("t").over(we) - F.min("t").over(we))
        .where(F.col("dur") > min_duration_s)
        .select("user_id", "event_id")
    )


def size_filter(
    part: DataFrame,
    size_std_threshold: float = P.SIZE_STD_THRESHOLD,
    aspect_ratio_threshold: float = P.ASPECT_RATIO_THRESHOLD,
) -> DataFrame:
    """remove_small_detections (marker_parsing.py:114): drop detections
    smaller than median − k·std and with max/min aspect ratio above
    threshold. Exercised on `part` (p_size, p_retailprice/50 as the two
    extents). Global stats are a 1-row aggregate broadcast back — the join
    is a BroadcastNestedLoop of exactly one row, free at any scale."""
    p = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("sx"),
        (F.col("p_retailprice") / 50.0).alias("sy"),
    ).withColumn("mksz", (F.col("sx") + F.col("sy")) / 2.0).withColumn(
        "aspect", F.greatest("sx", "sy") / F.least("sx", "sy")
    )
    stats = p.agg(
        F.median("mksz").alias("med_sz"), F.stddev_pop("mksz").alias("std_sz")
    )
    return (
        p.crossJoin(F.broadcast(stats))
        .where(
            (F.col("mksz") > F.col("med_sz") - size_std_threshold * F.col("std_sz"))
            & (F.col("aspect") < aspect_ratio_threshold)
        )
        .select("p_partkey")
    )


def bimodal_filter(
    events: DataFrame, n_stds_separate: float = P.BIMODAL_STD_SEP
) -> DataFrame:
    """_bimodality_check (marker_parsing.py:31), exact and deterministic.

    The reference runs sklearn k_means(k=2) on 1-D data (random init). In
    1-D the optimal 2-means is a threshold split on the sorted values, so
    we compute it EXACTLY: sort per user, prefix sums S_k / Q_k via window
    cumsum, objective max_k [S_k²/k + (S−S_k)²/(n−k)] (equivalent to
    minimizing within-cluster SSE), argmin by row_number. If the two
    clusters separate by more than n_stds_separate (c_hi − k·σ_hi >
    c_lo + k·σ_lo), keep only the larger-mean cluster; else keep all.
    Pure window algebra — one shuffle, any scale.
    """
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    # Totals come from the LAST cumsum value, not an unordered partition
    # aggregate: ordered running sums evaluate in identical sequence on any
    # engine, so s_n/q_n (and every objective derived from them) are
    # bit-identical to the DuckDB oracle.
    span = Window.partitionBy("user_id").orderBy("value", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    e = (
        events.select("user_id", "event_id", "value")
        .withColumn("k", F.row_number().over(w))
        .withColumn("s_k", F.sum("value").over(cum))
        .withColumn("q_k", F.sum(F.col("value") * F.col("value")).over(cum))
        .withColumn("n", F.count(F.lit(1)).over(span))
        .withColumn("s_n", F.last("s_k").over(span))
        .withColumn("q_n", F.last("q_k").over(span))
    )
    # candidate splits: cluster-lo = rows 1..k, cluster-hi = rows k+1..n
    cand = e.where(F.col("k") < F.col("n")).withColumn(
        "objective",
        F.col("s_k") * F.col("s_k") / F.col("k")
        + (F.col("s_n") - F.col("s_k")) * (F.col("s_n") - F.col("s_k"))
        / (F.col("n") - F.col("k")),
    )
    pick = Window.partitionBy("user_id").orderBy(F.desc("objective"), "k")
    best = (
        cand.withColumn("rnk", F.row_number().over(pick))
        .where(F.col("rnk") == 1)
        .select(
            "user_id",
            F.col("k").alias("split_k"),
            (F.col("s_k") / F.col("k")).alias("c_lo"),
            F.sqrt(F.greatest(
                F.col("q_k") / F.col("k") - (F.col("s_k") / F.col("k")) * (F.col("s_k") / F.col("k")),
                F.lit(0.0),
            )).alias("std_lo"),
            ((F.col("s_n") - F.col("s_k")) / (F.col("n") - F.col("k"))).alias("c_hi"),
            F.sqrt(F.greatest(
                (F.col("q_n") - F.col("q_k")) / (F.col("n") - F.col("k"))
                - ((F.col("s_n") - F.col("s_k")) / (F.col("n") - F.col("k")))
                * ((F.col("s_n") - F.col("s_k")) / (F.col("n") - F.col("k"))),
                F.lit(0.0),
            )).alias("std_hi"),
        )
    )
    is_bimodal = (F.col("c_hi") - n_stds_separate * F.col("std_hi")) > (
        F.col("c_lo") + n_stds_separate * F.col("std_lo")
    )
    # one row per user — join on the partition key (NOT broadcast: user
    # count grows with data; AQE may still pick broadcast at small SF).
    joined = e.join(best, "user_id")
    return joined.where(~is_bimodal | (F.col("k") > F.col("split_k"))).select(
        "user_id", "event_id", "value"
    )
