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

from vedb_gaze_spark.operators.cleaning import bimodal_filter
from vedb_gaze_spark.operators.temporal import with_tsec
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


def _epochs(df: DataFrame, gap_s: float) -> DataFrame:
    """Gap sessionization columns (split_timecourse's cumsum-of-breaks,
    marker_parsing.py:187) over an already-filtered detection stream."""
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    lag_t = F.lag("t").over(w)
    return df.withColumn(
        "new_epoch",
        F.when(lag_t.isNull() | (F.col("t") - lag_t > gap_s), 1).otherwise(0),
    ).withColumn(
        "epoch", F.sum("new_epoch").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def _marker_cleaned(events: DataFrame) -> DataFrame:
    """Stages 1-2 of the marker chain, shared by marker_pipeline and the
    filter_and_split / filter_and_cluster variants (marker_parsing.py:
    625/:661 compose exactly these stages before diverging): duplicate-
    timestamp removal → brief-episode pre-check → bimodality keep-rule.
    Returns the cleaned (user_id, event_id, t, value) stream."""
    det = with_tsec(events).where(F.col("event_type") == "error")
    # 1a. duplicate-timestamp removal (find_duplicates mode='all')
    wts = Window.partitionBy("user_id", "t")
    det = det.withColumn("n_at_ts", F.count(F.lit(1)).over(wts)).where(
        F.col("n_at_ts") == 1
    )
    # 1b. brief-episode pre-check
    we = Window.partitionBy("user_id", "epoch")
    s1 = (
        _epochs(det, P.SESSION_GAP_S)
        .withColumn("ep_dur", F.max("t").over(we) - F.min("t").over(we))
        .where(F.col("ep_dur") > P.BRIEF_MIN_S)
        .select("user_id", "event_id", "t", "value")
    )
    # 2. bimodality keep-rule on the survivors' values
    return s1.join(
        bimodal_filter(s1).select("user_id", "event_id"), ["user_id", "event_id"]
    )


def _marker_epochs_gated(s2: DataFrame) -> DataFrame:
    """Stage 3: re-sessionize the cleaned stream (split AFTER filtering,
    exactly as find_epochs orders its stages) and apply the epoch
    duration gates."""
    s3 = _epochs(s2.select("user_id", "event_id", "t", "value"), P.SESSION_GAP_S)
    wep = Window.partitionBy("user_id", "epoch")
    return s3.withColumn(
        "ep_dur", F.max("t").over(wep) - F.min("t").over(wep)
    ).where(
        (F.col("ep_dur") > P.SESSION_MIN_S) & (F.col("ep_dur") < P.SESSION_MAX_S)
    )


def marker_pipeline(events: DataFrame) -> DataFrame:
    """find_epochs (marker_parsing.py:470) as ONE declarative plan — the
    full marker chain the reference composes imperatively:

    1. duration pre-check: drop duplicate timestamps, then episodes
       shorter than the brief-detection threshold (remove_brief_detections,
       marker_parsing.py:53);
    2. bimodality filter on the surviving detection sizes
       (_bimodality_check via remove_small_detections, :31/:114 — the
       exact 1-D 2-means split of operators/cleaning.py);
    3. RE-split the cleaned stream into epochs (split_timecourse, :187)
       with the epoch duration gates — splitting after filtering, exactly
       as find_epochs orders its stages;
    4. grid-density clusters within each epoch with the per-cluster
       quality gates (cluster_marker_points/marker_cluster_stat,
       :299/:261);
    5. one row per surviving epoch with its passing-cluster count,
       gated by min_n_clusters (:485).

    Catalyst sees all five stages at once: the detection scan happens
    once, every window shares the user_id partitioning, and the epoch
    aggregation reuses the same shuffle — the pydra DAG's disk-written
    intermediates become pipelined exchanges."""
    s3 = _marker_epochs_gated(_marker_cleaned(events))
    # 4+5. ONE pass: cell-level aggregates roll up to the epoch level
    # (epoch t_start/t_end/n_points are exact unions of their cells'
    # min/max/counts), with the cluster quality gates applied as
    # conditional aggregation — s3's window chain evaluates once instead
    # of feeding two separate aggregation subtrees (measured: halves the
    # composed plan's wall time).
    cells = s3.withColumn("cell_t", F.floor(F.col("t") / P.GRID_T_EPS_S)).withColumn(
        "cell_v", F.floor(F.col("value") / P.GRID_V_EPS)
    )
    cell_agg = cells.groupBy("user_id", "epoch", "cell_t", "cell_v").agg(
        F.count(F.lit(1)).alias("n_in_cell"),
        F.min("t").alias("c_t0"),
        F.max("t").alias("c_t1"),
        F.median("value").alias("c_med"),
        F.stddev_pop("value").alias("c_std"),
    )
    gate = (
        (F.col("n_in_cell") >= P.GRID_MIN_PTS)
        & (F.col("c_t1") - F.col("c_t0") > P.CLUSTER_MIN_T_S)
        & (F.col("c_t1") - F.col("c_t0") < P.CLUSTER_MAX_T_S)
        & (F.col("c_std") < P.CLUSTER_MAX_STD)
    )
    return (
        cell_agg.groupBy("user_id", "epoch")
        .agg(
            F.min("c_t0").alias("t_start"),
            F.max("c_t1").alias("t_end"),
            F.sum("n_in_cell").alias("n_points"),
            F.count(F.when(gate, F.lit(1))).alias("n_clusters"),
            F.round(F.median(F.when(gate, F.col("c_med"))), 6).alias("med_cluster_value"),
        )
        .where(F.col("n_clusters") >= P.MARKER_MIN_CLUSTERS)
        .select(
            "user_id", "epoch", "t_start", "t_end",
            "n_points", "n_clusters", "med_cluster_value",
        )
    )


def marker_filter_split(events: DataFrame) -> DataFrame:
    """filter_and_split (marker_parsing.py:625): the marker chain's
    clean-then-split re-ordering WITHOUT clustering — duration pre-check
    → bimodal size filter → split_timecourse with the epoch duration
    gates, one summary row per surviving epoch. Same shared stages as
    marker_pipeline (one detection scan, one user_id partitioning); the
    chain simply stops before the cluster rollup."""
    s3 = _marker_epochs_gated(_marker_cleaned(events))
    return (
        s3.groupBy("user_id", "epoch")
        .agg(
            F.min("t").alias("t_start"),
            F.max("t").alias("t_end"),
            (F.max("t") - F.min("t")).alias("duration_s"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select("user_id", "epoch", "t_start", "t_end", "duration_s", "n_points")
    )


def marker_filter_cluster(events: DataFrame) -> DataFrame:
    """filter_and_cluster (marker_parsing.py:661): clean then cluster the
    WHOLE stream — no epoch splitting — with the per-cluster quality
    gates (marker_cluster_stat, :261) and the reference's min_n_clusters
    session gate (a user whose surviving clusters number fewer than the
    minimum yields None there; here their clusters drop out). One row per
    surviving grid cluster."""
    s2 = _marker_cleaned(events)
    cells = s2.withColumn(
        "cell_t", F.floor(F.col("t") / P.GRID_T_EPS_S)
    ).withColumn("cell_v", F.floor(F.col("value") / P.GRID_V_EPS))
    clus = (
        cells.groupBy("user_id", "cell_t", "cell_v")
        .agg(
            F.count(F.lit(1)).alias("n_in_cell"),
            F.min("t").alias("t_start"),
            F.max("t").alias("t_end"),
            F.round(F.median("value"), 6).alias("med_value"),
            F.stddev_pop("value").alias("c_std"),
        )
        .where(
            (F.col("n_in_cell") >= P.GRID_MIN_PTS)
            & (F.col("t_end") - F.col("t_start") > P.CLUSTER_MIN_T_S)
            & (F.col("t_end") - F.col("t_start") < P.CLUSTER_MAX_T_S)
            & (F.col("c_std") < P.CLUSTER_MAX_STD)
        )
    )
    wn = Window.partitionBy("user_id")
    return (
        clus.withColumn("n_user_clusters", F.count(F.lit(1)).over(wn))
        .where(F.col("n_user_clusters") >= P.MARKER_MIN_CLUSTERS)
        .select(
            "user_id", "cell_t", "cell_v", "n_in_cell",
            "t_start", "t_end", "med_value",
        )
    )


def marker_pixel_pipeline(
    frames: DataFrame,
    threshold: int = 200,
    min_size: int = 4,
    value_col: str = "x",
    marker_type: str = "concentric",
    board: tuple = (3, 6),
    require_rings: bool = False,
) -> DataFrame:
    """find_epochs ON REAL FRAMES as one callable plan — the reference's
    full camera-to-calibration-marker chain (marker_detection.py:29
    _find_circles_frame per frame, then marker_parsing.py:470
    find_epochs over the detection stream): raw frame payloads →
    detect_frame_markers (PNM decode → threshold → linear connected
    components → centroid/size/norm_pos) → detections_to_marker_stream
    (events-schema adapter, collision-free event_id packing) →
    marker_filter_cluster (dedup/outlier/bimodal gates + grid cluster
    rollup with per-cluster quality gates).

    One row per surviving marker cluster. The whole chain is a single
    DataFrame expression: frame decoding parallelizes per frame
    (Arrow-batched mapInPandas), and everything downstream is the same
    shared-scan declarative plan as marker_filter_cluster — Catalyst
    sees detection and clustering at once, no intermediate
    materialization. Planted-frame e2e pin: tests/test_sources.py
    (exact centroids in, planted position clusters out).

    ``marker_type`` selects the reference's two marker families:
    'concentric' (marker_detection.py:29 _find_circles_frame; pass
    require_rings=True for the CircleTracker nested-ellipse acceptance)
    or 'checkerboard' (marker_detection.py:185 find_checkerboard_frame
    — the full inner-corner grid averaged to one location per frame,
    ``board`` = inner corners per row/column). Both feed the SAME
    downstream stream adapter and cluster gates — the marker type only
    changes the per-frame detector, exactly the reference's split."""
    from vedb_gaze_spark.operators.multimodal import (
        detect_checkerboard_frames,
        detect_frame_markers,
        detections_to_marker_stream,
    )

    if marker_type == "checkerboard":
        det = detect_checkerboard_frames(
            frames, board=board, threshold=threshold
        ).drop("corner_xs", "corner_ys")
    elif marker_type == "concentric":
        det = detect_frame_markers(
            frames,
            threshold=threshold,
            min_size=min_size,
            require_rings=require_rings,
        )
    else:
        raise ValueError(
            f"marker_type must be 'concentric' or 'checkerboard'; got {marker_type!r}"
        )
    return marker_filter_cluster(
        detections_to_marker_stream(det, value_col=value_col)
    )


def pupil_pixel_pipeline(
    pupil_frames: DataFrame,
    marker_frames: DataFrame,
    pupil_threshold: int = 60,
    marker_threshold: int = 200,
    min_confidence: float = 0.6,
    match_tol_s: float = 0.5,
    pupil_refine: str = "none",
) -> DataFrame:
    """The reference's FULL camera-to-error chain on real pixels — the
    pupil-side twin of marker_pixel_pipeline, closing the pipelines.py
    DAG end-to-end from raw frames (pupil_detection_pl.py:11
    plabs_detect_pupil over eye video → utils.py:6 match_time_points
    pupil↔marker alignment → calibration.py:468 Calibration.fit/map →
    error_computation.py:18 compute_error):

    1. eye frames    → detect_pupil_frames   (dark-component ellipse
       moments: norm_pos + roundness confidence per frame)
    2. world frames  → detect_frame_markers  (bright-blob centroids;
       frames with exactly one detection keep it — a calibration-epoch
       world frame shows one marker)
    3. nearest-time pupil↔marker pairing per user within match_tol_s
       (match_time_points' window semantics as one union + two
       ordered windows over the shared user_id partitioning — no
       join explosion, backward/forward candidates picked by |Δt|)
    4. confidence gate (parse_plab_data's min_calibration_confidence)
    5. per-user OLS calibration fit + mapped-gaze error in degrees

    One QC row per user: fit coefficients, pair count, rmse/median
    error in degrees. Every stage after the two Arrow-batched
    detectors is declarative — Catalyst sees detection, alignment,
    fit, and error as one plan, sharing the user_id partitioning.
    Scale: detectors are per-frame embarrassingly parallel; the
    alignment windows and the fit aggregate shuffle once on user_id;
    the fit join-back is per-user-tiny (broadcast under AQE)."""
    from vedb_gaze_spark.operators.multimodal import (
        detect_frame_markers,
        detect_pupil_frames,
    )

    p = detect_pupil_frames(
        pupil_frames, threshold=pupil_threshold, refine=pupil_refine
    ).where(F.col("confidence") > min_confidence)
    m = single_detection_gate(
        detect_frame_markers(marker_frames, threshold=marker_threshold)
    )
    g = pair_pupil_markers(p, m, match_tol_s)
    # g feeds BOTH the fit aggregate and the mapped-error pass; without
    # materialization the whole Arrow detection + pairing chain
    # re-executes per consumer (plan-audited: the detectors ran twice).
    # Pair-table-sized — the dedup_agreement checkpoint idiom.
    from vedb_gaze_spark.functions.core import iter_checkpoint

    g = iter_checkpoint(g, eager=False)

    fit = g.groupBy("user_id").agg(
        F.regr_slope("mx", "px").alias("bx"),
        F.regr_intercept("mx", "px").alias("ax"),
        F.regr_slope("my", "py").alias("by"),
        F.regr_intercept("my", "py").alias("ay"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    mapped = g.join(fit, "user_id")
    ex = (F.col("ax") + F.col("bx") * F.col("px") - F.col("mx")) * P.DEG_HORIZ
    ey = (F.col("ay") + F.col("by") * F.col("py") - F.col("my")) * P.DEG_VERT
    err = F.sqrt(ex * ex + ey * ey)
    return mapped.groupBy("user_id").agg(
        F.first("n_pairs").alias("n_pairs"),
        F.round(F.first("bx"), 6).alias("slope_x"),
        F.round(F.first("ax"), 6).alias("intercept_x"),
        F.round(F.first("by"), 6).alias("slope_y"),
        F.round(F.first("ay"), 6).alias("intercept_y"),
        F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse_deg"),
        F.round(F.median(err), 6).alias("median_err_deg"),
    )


def single_detection_gate(detections: DataFrame) -> DataFrame:
    """Keep only frames with exactly ONE detection (a calibration-epoch
    world frame shows one marker). One windowed count over the
    detection stream — a groupBy + join-back would scan the Arrow
    detector twice (plan-audited; the detectors are the expensive
    stage in any pixel chain)."""
    wf = Window.partitionBy("user_id", "frame_id")
    return detections.withColumn(
        "n_det", F.count(F.lit(1)).over(wf)
    ).where(F.col("n_det") == 1)


def pair_pupil_markers(
    p: DataFrame, m: DataFrame, match_tol_s: float = 0.5
) -> DataFrame:
    """Nearest-time pupil↔marker pairing per user within match_tol_s —
    utils.py:6 match_time_points' window semantics as one union + two
    ordered windows over the shared user_id partitioning (no join
    explosion; backward/forward candidates picked by |Δt|). ``p`` is a
    confidence-gated pupil detection stream (norm_x/norm_y per frame),
    ``m`` a single-detection-gated marker stream. Returns one row per
    surviving pupil sample: (user_id, t, px, py, mx, my, dt). Factored
    out of pupil_pixel_pipeline (r11) so the profile-driven chain
    (plans/profiles.py:run_profile_chain) shares the identical plan."""
    from vedb_gaze_spark.functions.core import tsec

    pu = p.select(
        "user_id",
        tsec("ts").alias("t"),
        F.lit(1).alias("is_pupil"),
        F.col("norm_x").alias("px"),
        F.col("norm_y").alias("py"),
        F.lit(None).cast("double").alias("mx"),
        F.lit(None).cast("double").alias("my"),
        F.lit(None).cast("double").alias("mt"),
    )
    mk = m.select(
        "user_id",
        tsec("ts").alias("t"),
        F.lit(0).alias("is_pupil"),
        F.lit(None).cast("double").alias("px"),
        F.lit(None).cast("double").alias("py"),
        F.col("norm_x").alias("mx"),
        F.col("norm_y").alias("my"),
        tsec("ts").alias("mt"),
    )
    u = pu.unionByName(mk)
    # backward: marker rows sort BEFORE a same-second pupil row, so the
    # running last_value includes a simultaneous marker; forward is the
    # mirror (pupil first, following range holds the simultaneous marker)
    back = Window.partitionBy("user_id").orderBy("t", "is_pupil").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fwd = Window.partitionBy("user_id").orderBy(
        "t", F.col("is_pupil").desc()
    ).rowsBetween(0, Window.unboundedFollowing)
    paired = (
        u.withColumn("bmx", F.last("mx", ignorenulls=True).over(back))
        .withColumn("bmy", F.last("my", ignorenulls=True).over(back))
        .withColumn("bmt", F.last("mt", ignorenulls=True).over(back))
        .withColumn("fmx", F.first("mx", ignorenulls=True).over(fwd))
        .withColumn("fmy", F.first("my", ignorenulls=True).over(fwd))
        .withColumn("fmt", F.first("mt", ignorenulls=True).over(fwd))
        .where(F.col("is_pupil") == 1)
    )
    db = F.col("t") - F.col("bmt")
    df_ = F.col("fmt") - F.col("t")
    use_back = F.col("bmt").isNotNull() & (
        F.col("fmt").isNull() | (db <= df_)
    )
    g = paired.select(
        "user_id",
        "t",
        "px",
        "py",
        F.when(use_back, F.col("bmx")).otherwise(F.col("fmx")).alias("mx"),
        F.when(use_back, F.col("bmy")).otherwise(F.col("fmy")).alias("my"),
        F.when(use_back, db).otherwise(df_).alias("dt"),
    ).where(F.col("mx").isNotNull() & (F.col("dt") <= match_tol_s))
    return g


def curation_pipeline(documents: DataFrame) -> DataFrame:
    """Training-corpus curation as ONE declarative plan — the LLM-data
    analog of gaze_pipeline's composed DAG (reference pipelines.py wires
    stages through pydra; here Catalyst sees the whole chain):

    1. language gate        (lang_id: marker-stopword argmax)
    2. quality-score gate   (text_quality composite ≥ threshold)
    3. entropy band         (char_entropy: degenerate/noise cut)
    4. near-dup prune       (dedup_prune: canonical-per-cluster + unique)

    emitting every surviving doc with its metrics and dedup status.

    Scale shape (r14 fusion, PERF_NOTES): every per-row branch —
    quality, language, and (in curation_full) repetition + PII — is
    computed as COLUMNS of ONE projection over the corpus scan, not as
    separate scans joined back on doc_id: the pre-r14 shape paid one
    corpus scan plus one corpus-sized shuffle join PER BRANCH. What
    remains joined is only what genuinely isn't row-local: the entropy
    aggregate (O(docs × alphabet) shuffle) and the near-dup CLUSTER
    table — pair-graph-sized, broadcast under AQE — against which the
    prune filter and status are applied directly (dedup_prune's own
    corpus-sided output would make that join big-big). Output is
    row-for-row identical to the joined form: all branches project the
    same source, so inner-joining them on the unique doc_id key was
    only column concatenation.
    """
    return _curation_sweep(documents, full=False)


def _curation_sweep(documents: DataFrame, full: bool) -> DataFrame:
    from vedb_gaze_spark.operators.dedup import dedup_clusters
    from vedb_gaze_spark.operators.text import (
        char_entropy,
        lang_pred_col,
        pii_cols,
        quality_cols,
        repetition_cols,
    )

    q = quality_cols()
    cols = [
        F.col("doc_id"),
        q["n_tokens"].alias("n_tokens"),
        q["quality"].alias("quality"),
        lang_pred_col().alias("pred_lang"),
    ]
    out_cols = ["doc_id", "n_tokens", "quality", "entropy_bits", "status"]
    gates = (
        (F.col("pred_lang") == P.CURATION_LANG)
        & (F.col("n_tokens") >= P.CURATION_MIN_TOKENS)
        & (F.col("quality") >= P.CURATION_MIN_QUALITY)
    )
    if full:
        top, dup = repetition_cols()
        pii, _ = pii_cols()
        n_pii = None
        for c in pii.values():
            n_pii = c if n_pii is None else n_pii + c
        cols += [
            top.alias("top_word_frac"),
            dup.alias("dup_2gram_frac"),
            n_pii.alias("n_pii"),
        ]
        out_cols += ["top_word_frac", "dup_2gram_frac", "n_pii"]
        gates = (
            gates
            & (F.col("top_word_frac") <= P.CURATION_MAX_TOP_WORD)
            & (F.col("dup_2gram_frac") <= P.CURATION_MAX_DUP_2GRAM)
        )
    # the n_tokens >= 1 fence the standalone quality/repetition faces
    # carry is subsumed by CURATION_MIN_TOKENS >= 1
    perrow = documents.select(*cols).where(gates)
    en = char_entropy(documents).select("doc_id", "entropy_bits")
    lab = dedup_clusters(documents).select("doc_id", "cluster_id")
    return (
        perrow.join(en, "doc_id")
        .where(
            (F.col("entropy_bits") >= P.CURATION_ENTROPY_LO)
            & (F.col("entropy_bits") <= P.CURATION_ENTROPY_HI)
        )
        .join(lab, "doc_id", "left")
        .where(
            F.col("cluster_id").isNull()
            | (F.col("cluster_id") == F.col("doc_id"))
        )
        .withColumn(
            "status",
            F.when(F.col("cluster_id").isNull(), F.lit("unique")).otherwise(
                F.lit("canonical")
            ),
        )
        .select(*out_cols)
    )


def curation_full(documents: DataFrame) -> DataFrame:
    """curation_pipeline plus the r4 gates — the full pre-training sweep
    a 100 TB corpus gets in one Catalyst plan:

    5. repetition gates     (repetition_score: top-word and dup-2gram
                             fractions under the p90 cuts)
    6. PII audit            (pii_scrub counts carried through for the
                             curation report; this corpus scrubs clean)

    The repetition and PII branches are stateless per-row projections —
    r14: they ride the SAME fused projection as the quality/language
    gates (_curation_sweep), so the full sweep costs exactly one more
    set of columns than curation_pipeline, not two more corpus scans
    plus two corpus-sized joins."""
    return _curation_sweep(documents, full=True)


def corpus_pipeline(documents: DataFrame) -> DataFrame:
    """Training-set ASSEMBLY as one declarative plan — the stage after
    curation_full's filtering: take the raw corpus to packed, weighted
    training sequences (SURVEY §2.H):

    1. decontaminate   drop training docs sharing any word n-gram with
                       the held-out benchmark slice (the slice itself is
                       excluded from training)
    2. line_dedup      segment-level exact dedup; docs keep only their
                       first-global-occurrence segments, fully-duplicated
                       docs empty out and are dropped
    3. stratified_sample  deterministic hash-threshold domain mixing at
                       the target per-language rates, with inverse-rate
                       resampling weights
    4. pack_sequences  greedy token-budget packing of the DEDUPED text,
                       per (source, shard), in doc_id order — the
                       P.PACK_SHARD_DOCS bound is DEFAULT-ON so a hot
                       source can never become one unbounded pack task

    Output: (source, shard, doc_id, n_tokens, pack_id, weight) — one
    row per surviving doc with its pack assignment and mixing weight;
    pack_id counts from 0 per (source, shard).

    Scale shape — ONE linear chain, nothing recomputed mid-plan: the
    benchmark n-gram set broadcasts into an anti join (stage 1 never
    shuffles the corpus); stage 2 carries lang/source THROUGH the
    segment explode (line_dedup's carry columns) so nothing re-joins the
    corpus afterward; stage 3 is a row-local hash filter on the dedup
    output — no join; stage 4 shuffles once on the pack group key.
    Three corpus scans total (benchmark n-gram build, contamination
    probe, the train chain — test-pinned at FileScan == 3)."""
    from vedb_gaze_spark.operators.corpus import (
        decontaminate,
        greedy_pack,
        line_dedup,
        sample_cols,
    )

    # contaminated is contamination-rate-dependent (usually tiny, but a
    # poisoned corpus could make it arbitrarily large) — no forced
    # broadcast hint; AQE broadcasts the anti-join side when its runtime
    # size is actually small.
    contaminated = decontaminate(documents).select("doc_id")
    train = documents.where(
        F.col("doc_id") % P.DECONTAM_BENCH_MOD != 0
    ).join(contaminated, "doc_id", "left_anti")
    dd = line_dedup(train, carry=("lang", "source")).where(
        F.col("kept_segments") > 0
    )
    # stratified sample as a row-local filter on the dedup output — the
    # SAME algebra object as stratified_sample (corpus.sample_cols), as
    # a filter instead of a join
    rate, u = sample_cols()
    sampled = (
        dd.withColumn("rate", rate)
        .withColumn("u", u)
        .where(F.col("u") < F.col("rate"))
        .select(
            "source",
            "doc_id",
            F.expr("size(split(trim(text_dedup), '\\\\s+'))")
            .cast("long")
            .alias("n_tokens"),
            F.round(F.lit(1.0) / F.col("rate"), 6).alias("weight"),
        )
    )
    return greedy_pack(
        sampled,
        P.PACK_BUDGET_TOKENS,
        extra_cols=("weight",),
        shard_docs=P.PACK_SHARD_DOCS,
    ).select("source", "shard", "doc_id", "n_tokens", "pack_id", "weight")


def corpus_pipeline_novelty(documents: DataFrame) -> DataFrame:
    """corpus_pipeline with the NOVELTY GATE folded in between
    decontamination and sampling — the intake-gate composition
    ngram_novelty exists for (score what a batch adds over what the
    corpus already has, BEFORE spending sampling/packing budget on it):

    1. decontaminate      (as corpus_pipeline)
    2. novelty gate       ngram_novelty over the NON-BENCHMARK pool;
                          keep train docs with novelty ≥ P.NOVELTY_MIN
                          (docs too short to form a single n-gram have
                          no assessable novelty and drop with the gate)
    3. line_dedup         segment-level exact dedup on survivors
    4. stratified_sample  row-local hash-threshold mixing
    5. pack_sequences     greedy token-budget packing

    Output adds the doc's novelty score to corpus_pipeline's schema.
    Novelty is scored against the WHOLE candidate pool (every
    non-benchmark doc), not the post-decontamination survivors: "what
    does this doc add over what the pool already has" counts grams
    first owned by a later-dropped contaminated doc as seen — and,
    mechanically, scoring the pool keeps the decontamination anti-join
    subtree out of the novelty branch, which would otherwise be
    re-evaluated once per novelty rollup (measured: 9 FileScans → 6).
    Scale shape: the gate adds ngram_novelty's two doc-level rollups
    (map-side-combining over hashed-gram / doc_id keys — no
    corpus-sized gram join, see ngram_novelty) plus ONE doc-keyed
    inner join of the train set against its per-doc scores; novelty
    rides line_dedup's carry columns so nothing re-joins downstream."""
    from vedb_gaze_spark.operators.corpus import (
        decontaminate,
        greedy_pack,
        line_dedup,
        sample_cols,
    )
    from vedb_gaze_spark.operators.text import ngram_novelty

    contaminated = decontaminate(documents).select("doc_id")
    pool = documents.where(F.col("doc_id") % P.DECONTAM_BENCH_MOD != 0)
    train = pool.join(contaminated, "doc_id", "left_anti")
    nov = ngram_novelty(pool).where(
        F.col("novelty") >= P.NOVELTY_MIN
    ).select("doc_id", "novelty")
    gated = train.join(nov, "doc_id")
    dd = line_dedup(gated, carry=("lang", "source", "novelty")).where(
        F.col("kept_segments") > 0
    )
    rate, u = sample_cols()
    sampled = (
        dd.withColumn("rate", rate)
        .withColumn("u", u)
        .where(F.col("u") < F.col("rate"))
        .select(
            "source",
            "doc_id",
            F.expr("size(split(trim(text_dedup), '\\\\s+'))")
            .cast("long")
            .alias("n_tokens"),
            F.round(F.lit(1.0) / F.col("rate"), 6).alias("weight"),
            "novelty",
        )
    )
    return greedy_pack(
        sampled,
        P.PACK_BUDGET_TOKENS,
        extra_cols=("weight", "novelty"),
        shard_docs=P.PACK_SHARD_DOCS,
    ).select(
        "source", "shard", "doc_id", "n_tokens", "pack_id", "weight",
        "novelty",
    )


def corpus_pipeline_mixed(documents: DataFrame) -> DataFrame:
    """corpus_pipeline with the MIXTURE CALCULATOR in the loop: instead
    of static per-language rates, mix_plan's epochs column (alloc /
    available tokens for the Chinchilla-style MIX_TARGET shares) drives
    the sampler — and epochs > 1 means the paper-standard UPSAMPLING of
    scarce domains, realized as a repeat explode:

        n_copies(doc) = floor(e) + [u < frac(e)],   u = hash(salt‖doc_id)/2⁶⁰

    which reduces exactly to the stratified keep/drop draw when e ≤ 1
    and emits each kept doc as (doc_id, epoch 0..n_copies−1) rows with
    resampling weight 1/e. Deterministic like every sampler here — the
    same copies on any engine, partitioning, or rerun.

    One linear plan: decontaminate → line_dedup → mixture explode →
    greedy_pack per (source, shard) ordered by (doc_id, epoch) so a
    doc's copies pack adjacently and the order stays total under
    repeated doc_ids. The mix table is lang-count-sized (a model, not a
    vocabulary — the dsir_select contrast) and broadcast-joined onto
    the dedup stream; the token inventory it divides by is computed
    over the raw corpus, the same statistics mix_plan publishes."""
    from vedb_gaze_spark.functions.core import portable_hash60
    from vedb_gaze_spark.operators.corpus import (
        decontaminate,
        greedy_pack,
        line_dedup,
        mix_plan,
    )

    contaminated = decontaminate(documents).select("doc_id")
    train = documents.where(
        F.col("doc_id") % P.DECONTAM_BENCH_MOD != 0
    ).join(contaminated, "doc_id", "left_anti")
    dd = line_dedup(train, carry=("lang", "source")).where(
        F.col("kept_segments") > 0
    )
    plan = mix_plan(documents).select("lang", "epochs")
    u = portable_hash60(
        F.concat(F.lit(P.MIX_SALT), F.col("doc_id").cast("string"))
    ) / F.lit(P.SAMPLE_DENOM)
    frac = F.col("epochs") - F.floor("epochs")
    mixed = (
        dd.join(F.broadcast(plan), "lang")
        .withColumn(
            "n_copies",
            (F.floor("epochs") + (u < frac).cast("long")).cast("long"),
        )
        .where(F.col("n_copies") > 0)
        .select(
            "source",
            "doc_id",
            F.explode(F.expr("sequence(0L, n_copies - 1)")).alias("epoch"),
            F.expr("size(split(trim(text_dedup), '\\\\s+'))")
            .cast("long")
            .alias("n_tokens"),
            F.round(F.lit(1.0) / F.col("epochs"), 6).alias("weight"),
        )
    )
    return greedy_pack(
        mixed,
        P.PACK_BUDGET_TOKENS,
        extra_cols=(("epoch", "long"), "weight"),
        shard_docs=P.PACK_SHARD_DOCS,
        order_cols=("doc_id", "epoch"),
    ).select(
        "source", "shard", "doc_id", "epoch", "n_tokens", "pack_id", "weight"
    )
