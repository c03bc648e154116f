"""Eyelid-distance blink detection (SURVEY §2.F extension).

Re-expresses the reference's PRIMARY blink path — ``detect_blinks``
(labeling.py:373) over ``get_eyelid_distance`` (labeling.py:237) with
``get_major_minor_axes_pca`` alignment (labeling.py:181) — beside the
confidence-threshold variant already ported as ``detect_blinks``.

Reference pipeline: DLC eyelid keypoints per frame → one PCA over the
pooled point cloud (rotate the eye upright, keeping the original mean) →
per-frame max distance between upper and lower lids → distance as a
fraction of max eye opening → closing/opening detected from the signed
VELOCITY of that fraction → blink = closing onset paired with the next
opening, gated by duration bounds.

Spark-first shape:
- keypoints: the test tables carry no DLC output, so K points per lid
  are derived deterministically from event_id (integer arithmetic, the
  signals.py convention) — an explode(sequence) flat map, no Python;
- PCA: 2-D principal axis in CLOSED FORM, θ = ½·atan2(2·Sxy, Sxx−Syy),
  from population-covariance aggregates over the pooled cloud — the
  sklearn PCA().fit call becomes one tiny per-user aggregate that
  broadcasts back (labeling.py:193's fit is exactly this 2×2 eigen
  problem);
- distance/velocity/pairing: single sorted window per user; blink
  pairing is "each opening offset takes its nearest preceding closing
  onset" — the deterministic, order-independent re-statement of the
  reference's sequential state machine (labeling.py:279+), with the same
  duration gates.

Every stage is SQL-expressible, so the whole chain is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vedb_gaze_spark.operators.temporal import with_tsec
from vedb_gaze_spark.plans import params as P

N_KPTS = 5


def _keypoints(events: DataFrame) -> DataFrame:
    """K deterministic keypoints per lid per event: (x, y_up) and
    (x', y_lo) with lid-specific x jitter so PCA rotation genuinely
    mixes the axes."""
    e = with_tsec(events).select("user_id", "event_id", "t")
    kp = e.select(
        "user_id", "event_id", "t",
        F.explode(F.sequence(F.lit(0), F.lit(N_KPTS - 1))).alias("j"),
    )
    k = F.col("event_id")
    j = F.col("j")
    xu = j * 10.0 + ((k * 7129 + j * 31) % 100) / 50.0
    xl = j * 10.0 + ((k * 6037 + j * 37) % 100) / 50.0
    yu = 20.0 + ((k * 8191 + j * 101) % 300) / 10.0
    yl = -20.0 - ((k * 4099 + j * 103) % 300) / 10.0
    return kp.select(
        "user_id", "event_id", "t",
        xu.alias("xu"), yu.alias("yu"), xl.alias("xl"), yl.alias("yl"),
    )


def _pca_angle(kp: DataFrame) -> DataFrame:
    """Per-user principal-axis angle of the pooled (upper+lower) point
    cloud: θ = ½·atan2(2·Sxy, Sxx − Syy) — the closed form of the 2×2
    PCA the reference fits (labeling.py:193)."""
    pooled = kp.select("user_id", F.col("xu").alias("x"), F.col("yu").alias("y")).unionByName(
        kp.select("user_id", F.col("xl").alias("x"), F.col("yl").alias("y"))
    )
    m = pooled.groupBy("user_id").agg(
        F.var_pop("x").alias("sxx"),
        F.var_pop("y").alias("syy"),
        F.covar_pop("x", "y").alias("sxy"),
    )
    theta = 0.5 * F.atan2(2.0 * F.col("sxy"), F.col("sxx") - F.col("syy"))
    return m.select("user_id", F.cos(theta).alias("ct"), F.sin(theta).alias("st"))


def eyelid_distance(events: DataFrame) -> DataFrame:
    """get_eyelid_distance (labeling.py:237): per event, the maximum
    PCA-aligned vertical gap between upper and lower lid keypoints
    (the rotated-frame y difference; rotation mixes x into y exactly as
    the reference's transform does)."""
    kp = _keypoints(events)
    ang = _pca_angle(kp)
    k = kp.join(F.broadcast(ang), "user_id")
    gap = (
        F.col("ct") * (F.col("yu") - F.col("yl"))
        - F.col("st") * (F.col("xu") - F.col("xl"))
    )
    return (
        k.withColumn("gap", gap)
        .groupBy("user_id", "event_id")
        .agg(F.max("t").alias("t"), F.round(F.max("gap"), 6).alias("dist"))
        .select("user_id", "event_id", "t", "dist")
    )


def eyelid_distance_c2f(
    events: DataFrame,
    coarse: int = 100,
    fine: int = 100,
) -> DataFrame:
    """get_eyelid_distance_coarse_to_fine (labeling.py:200): the
    reference's two-resolution search over CONTINUOUS lid curves, kept
    faithful where ``eyelid_distance`` takes the keypoint max directly.

    1. per-(event, lid) QUADRATIC lid fit through the K keypoints —
       closed-form least squares (Cramer's rule on the degree-4 moment
       matrix), pure JVM aggregates; the reference gets its coefficients
       from pylids' fits, this derives them from the same keypoints;
    2. coarse pass: |up(x) − lo(x)| on a C-point uniform grid over the
       event's keypoint x-span; argmax with the reference's first-match
       tie-break;
    3. fine pass: F points on [x_{j*−1}, x_{j*}] — including the
       reference's wrap-around quirk (np indexing: argmax 0 → the LAST
       coarse point, a descending span linspace handles);
    4. the fine maximum is the reported distance (coarse values are only
       a search aid, exactly as in the reference).

    Both passes are bounded explode(sequence) flat maps — (C+F)× row
    expansion, the same per-frame evaluation count the reference pays —
    and every expression is shared token-for-token with the SQL oracle.
    """
    kp = _keypoints(events)
    up = kp.select(
        "user_id", "event_id", "t", F.lit(0).alias("lid"),
        F.col("xu").alias("x"), F.col("yu").alias("y"),
    )
    lo = kp.select(
        "user_id", "event_id", "t", F.lit(1).alias("lid"),
        F.col("xl").alias("x"), F.col("yl").alias("y"),
    )
    pts = up.unionByName(lo)

    # The Cramer formulas live INSIDE the aggregate's result expressions,
    # not a projection on top of it: aggregate output is a hard boundary
    # CollapseProject cannot merge a downstream projection into, so the
    # coefficient rational trees are GUARANTEED to evaluate once per
    # event — never re-inlined into the 100x-exploded gap expression by a
    # projection merge, whatever later optimizer rules do. Identical
    # F.sum terms dedupe into one moment aggregate each.
    def coefs(lid: int) -> tuple[F.Column, F.Column, F.Column]:
        x, y = F.col("x"), F.col("y")

        def mom(expr) -> F.Column:
            return F.sum(F.when(F.col("lid") == lid, expr).otherwise(F.lit(0.0)))

        s0, s1, s2 = mom(F.lit(1.0)), mom(x), mom(x * x)
        s3, s4 = mom(x * x * x), mom(x * x * x * x)
        t0, t1, t2 = mom(y), mom(x * y), mom(x * x * y)
        det = (
            s0 * (s2 * s4 - s3 * s3)
            - s1 * (s1 * s4 - s3 * s2)
            + s2 * (s1 * s3 - s2 * s2)
        )
        da = (
            t0 * (s2 * s4 - s3 * s3)
            - s1 * (t1 * s4 - s3 * t2)
            + s2 * (t1 * s3 - s2 * t2)
        )
        db = (
            s0 * (t1 * s4 - s3 * t2)
            - t0 * (s1 * s4 - s3 * s2)
            + s2 * (s1 * t2 - t1 * s2)
        )
        dc = (
            s0 * (s2 * t2 - t1 * s3)
            - s1 * (s1 * t2 - t1 * s2)
            + t0 * (s1 * s3 - s2 * s2)
        )
        return da / det, db / det, dc / det

    au, bu, cu = coefs(0)
    al, bl, cl = coefs(1)
    m = pts.groupBy("user_id", "event_id").agg(
        F.max("t").alias("t"),
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        au.alias("au"), bu.alias("bu"), cu.alias("cu"),
        al.alias("al"), bl.alias("bl"), cl.alias("cl"),
    )

    step = (F.col("x1") - F.col("x0")) / float(coarse - 1)
    xj = F.col("x0") + F.col("j") * step
    gap = F.abs(
        (F.col("au") + F.col("bu") * xj + F.col("cu") * xj * xj)
        - (F.col("al") + F.col("bl") * xj + F.col("cl") * xj * xj)
    )
    co = m.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(coarse - 1))).alias("j")
    ).withColumn("gap", gap)
    # coarse argmax as a struct-MAX aggregation, not a row_number window:
    # struct comparison is lexicographic, so max(struct(gap, -j, ...))
    # is "largest gap, then smallest j" — np.argmax's first-match
    # tie-break exactly — and the aggregation partial-combines map-side,
    # so the shuffle carries ONE row per event instead of the C-times
    # exploded grid (the window form would shuffle all C·|events| rows).
    payload = [
        "t", "x0", "x1", "au", "bu", "cu", "al", "bl", "cl", "j",
    ]
    best = (
        co.groupBy("user_id", "event_id")
        .agg(
            F.max(
                F.struct(
                    F.col("gap"), (-F.col("j")).alias("nj"),
                    *[F.col(c) for c in payload],
                )
            ).alias("w")
        )
        .select("user_id", "event_id", *[F.col(f"w.{c}").alias(c) for c in payload])
    )

    # fine span: [coarse point j*−1 (wrapped, the np-indexing quirk), j*]
    xs = F.col("x0") + F.pmod(F.col("j") - 1, F.lit(coarse)) * step
    xe = F.col("x0") + F.col("j") * step
    best = best.select(
        "user_id", "event_id", "t",
        "au", "bu", "cu", "al", "bl", "cl",
        xs.alias("xs"), xe.alias("xe"),
    )
    xk = F.col("xs") + F.col("k") * (F.col("xe") - F.col("xs")) / float(fine - 1)
    fgap = F.abs(
        (F.col("au") + F.col("bu") * xk + F.col("cu") * xk * xk)
        - (F.col("al") + F.col("bl") * xk + F.col("cl") * xk * xk)
    )
    fi = best.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(fine - 1))).alias("k")
    ).withColumn("fgap", fgap)
    return (
        fi.groupBy("user_id", "event_id")
        .agg(F.max("t").alias("t"), F.round(F.max("fgap"), 6).alias("dist"))
        .select("user_id", "event_id", "t", "dist")
    )


def detect_blinks_eyelid(
    events: DataFrame,
    neg_vel: float = P.EYELID_NEG_VEL,
    pos_vel: float = P.EYELID_POS_VEL,
    min_s: float = P.BLINK_MIN_S,
    max_s: float = P.BLINK_MAX_S,
) -> DataFrame:
    """detect_blinks (labeling.py:373): eyelid distance as a fraction of
    the user's max opening; closings where the fraction's velocity drops
    below neg_vel, openings where it rises above pos_vel; each opening
    pairs with its nearest preceding closing; blink duration gated to
    [min_s, max_s]."""
    d = eyelid_distance(events)
    wu = Window.partitionBy("user_id")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    frac = F.col("dist") / F.max("dist").over(wu)
    d = d.withColumn("frac", frac).withColumn(
        "vel", (F.col("frac") - F.lag("frac").over(w)) / (F.col("t") - F.lag("t").over(w))
    )
    is_close = (F.col("vel") <= neg_vel) & (
        F.lag("vel").over(w).isNull() | (F.lag("vel").over(w) > neg_vel)
    )
    is_open = (F.col("vel") >= pos_vel) & (
        F.lead("vel").over(w).isNull() | (F.lead("vel").over(w) < pos_vel)
    )
    d = d.withColumn("is_close", is_close).withColumn("is_open", is_open)
    prevw = w.rowsBetween(Window.unboundedPreceding, -1)
    close_t = F.when(F.col("is_close"), F.col("t"))
    close_id = F.when(F.col("is_close"), F.col("event_id"))
    d = d.withColumn("on_t", F.last(close_t, ignorenulls=True).over(prevw)).withColumn(
        "on_id", F.last(close_id, ignorenulls=True).over(prevw)
    )
    return (
        d.where(F.col("is_open") & F.col("on_t").isNotNull())
        .withColumn("duration_s", F.col("t") - F.col("on_t"))
        .where((F.col("duration_s") >= min_s) & (F.col("duration_s") <= max_s))
        .select(
            "user_id",
            F.col("on_id").alias("start_event_id"),
            F.col("event_id").alias("end_event_id"),
            "duration_s",
        )
    )


def detect_blinks_phased(
    events: DataFrame,
    neg_vel: float = P.EYELID_NEG_VEL,
    pos_vel: float = P.EYELID_POS_VEL,
) -> DataFrame:
    """The FULL three-phase blink state machine — labeling.py:310
    _detect_blinks_eyevel (the kernel inside detect_blinks :373):
    a blink is a CLOSING run (velocity ≤ neg_vel), an optional
    FULL-CLOSURE run (neg_vel < velocity < pos_vel), then an OPENING
    run (velocity ≥ pos_vel), each phase duration-gated (the
    reference's min/max_eye_closing_time, max_full_closure_time,
    min_eye_opening_time, and the total min/max_full_blink_time —
    plans/params.py carries the reference's millisecond ratios
    rescaled to the event cadence). detect_blinks_eyelid is the
    two-event simplification (closing edge paired to opening edge);
    this is the run-level contract, declaratively:

      velocity → per-sample phase → gaps-and-islands run ids
      (sum-of-changes window) → one row per run (span, endpoints) →
      each closing run joined to its next one-or-two runs via lead()
      over the per-user run sequence → phase-pattern + duration gates.

    Every stage shares the ONE user_id partitioning; the run table is
    runs-sized (≪ samples), so the lead() windows are cheap. Fully
    SQL-oracled."""
    d = eyelid_distance(events)
    wu = Window.partitionBy("user_id")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    frac = F.col("dist") / F.max("dist").over(wu)
    d = d.withColumn("frac", frac).withColumn(
        "vel",
        (F.col("frac") - F.lag("frac").over(w))
        / (F.col("t") - F.lag("t").over(w)),
    ).where(F.col("vel").isNotNull())
    phase = (
        F.when(F.col("vel") <= neg_vel, F.lit("c"))
        .when(F.col("vel") >= pos_vel, F.lit("o"))
        .otherwise(F.lit("m"))
    )
    d = d.withColumn("phase", phase).withColumn(
        "chg",
        F.when(
            F.lag("phase").over(w).isNull()
            | (F.col("phase") != F.lag("phase").over(w)),
            1,
        ).otherwise(0),
    ).withColumn(
        "run",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = d.groupBy("user_id", "run").agg(
        F.first("phase").alias("phase"),
        F.min("t").alias("t0"),
        F.max("t").alias("t1"),
        F.min_by("event_id", F.struct("t", "event_id")).alias("start_id"),
        F.max_by("event_id", F.struct("t", "event_id")).alias("end_id"),
    )
    wr = Window.partitionBy("user_id").orderBy("run")
    r = (
        runs.withColumn("p1", F.lead("phase").over(wr))
        .withColumn("p1_t0", F.lead("t0").over(wr))
        .withColumn("p1_t1", F.lead("t1").over(wr))
        .withColumn("p1_end", F.lead("end_id").over(wr))
        .withColumn("p2", F.lead("phase", 2).over(wr))
        .withColumn("p2_t0", F.lead("t0", 2).over(wr))
        .withColumn("p2_t1", F.lead("t1", 2).over(wr))
        .withColumn("p2_end", F.lead("end_id", 2).over(wr))
        .where(F.col("phase") == "c")
    )
    # pattern c,o (zero-length closure) or c,m,o
    direct = F.col("p1") == "o"
    via_mid = (F.col("p1") == "m") & (F.col("p2") == "o")
    open_t0 = F.when(direct, F.col("p1_t0")).otherwise(F.col("p2_t0"))
    open_t1 = F.when(direct, F.col("p1_t1")).otherwise(F.col("p2_t1"))
    open_end = F.when(direct, F.col("p1_end")).otherwise(F.col("p2_end"))
    closure_s = F.when(direct, F.lit(0.0)).otherwise(
        F.col("p1_t1") - F.col("p1_t0")
    )
    out = (
        r.where(direct | via_mid)
        .select(
            "user_id",
            F.col("start_id").alias("start_event_id"),
            open_end.alias("end_event_id"),
            (F.col("t1") - F.col("t0")).alias("close_s"),
            closure_s.alias("closure_s"),
            (open_t1 - open_t0).alias("open_s"),
            (open_t1 - F.col("t0")).alias("duration_s"),
        )
        .where(
            (F.col("close_s") >= P.BLINK_CLOSE_MIN_S)
            & (F.col("close_s") <= P.BLINK_CLOSE_MAX_S)
            & (F.col("closure_s") <= P.BLINK_CLOSURE_MAX_S)
            & (F.col("open_s") >= P.BLINK_OPEN_MIN_S)
            & (F.col("duration_s") >= P.BLINK_MIN_S)
            & (F.col("duration_s") <= P.BLINK_MAX_S)
        )
    )
    return out


def eyelid_model(events: DataFrame) -> DataFrame:
    """The per-user FROZEN normalization model the streaming blink
    twin needs (r11, r10 verdict #5): principal-axis rotation (ct, st)
    and max eye opening (max_dist). Both are whole-history statistics
    in the batch operators (the PCA pools every keypoint; frac divides
    by the user's max dist), so a stream cannot derive them from a
    micro-batch — exactly the label_centroids situation, solved the
    same way: compute once over history, freeze, compile into the
    scorer. Users-sized model state."""
    kp = _keypoints(events)
    ang = _pca_angle(kp)
    dist = eyelid_distance(events)
    mx = dist.groupBy("user_id").agg(F.max("dist").alias("max_dist"))
    return ang.join(mx, "user_id").select(
        "user_id", "ct", "st", "max_dist"
    )
