"""Binocular calibration & gaze mapping (SURVEY §2.D).

Re-expresses the reference's two-eye path: ``calibrate_2d_binocular``
(calibration.py:207 — per-eye fits beside the joint fit) and
``Binocular_Gaze_Mapper`` (externals/gaze_mappers.py:18), whose
``on_pupil_datum`` loop (gaze_mappers.py:103) interleaves two pupil
streams: high-confidence samples pair with the temporally-nearest sample
of the OTHER eye and map binocularly (the fallback non-multivariate path
averages the two per-eye mapped positions, gaze_mappers.py:42-46);
low-confidence or unpairable samples map monocularly through their own
eye's fit.

Spark-first shape: per-(user, eye) closed-form OLS fits (a 2-rows-per-user
table, broadcast back), then ONE sorted window per user partition computes
each sample's nearest other-eye high-confidence neighbor (the as-of
union-merge trick from temporal.match_nearest — prev/next frames of the
same sort, no range join) carrying the partner's full struct, so the
binocular average needs no partner self-join. Single shuffle on user_id;
no per-row Python.

Deviations from the reference, for deterministic distributed semantics
(documented, oracle-identical by construction):
- the pairing cutoff is a fixed parameter (params.BINOCULAR_CUTOFF_S)
  instead of 2× a smoothed framerate estimate (gaze_mappers.py:104) —
  a running estimate is inherently sequential state;
- a high-confidence sample of eye 1 is suppressed (its data lives in the
  eye-0 anchored binocular row) whenever ITS nearest high-confidence
  eye-0 sample is within the cutoff — the symmetric single-pass rule —
  rather than "was popped from a deque by a specific eye-0 datum";
- an eye with NO high-confidence samples at all has no fit row, so the
  inner fit join drops that eye's samples entirely (they cannot be
  mapped "through their own eye's fit" — no fit exists). The reference
  would raise during calibration in this case; here the other eye keeps
  flowing monocularly. The oracle mirrors the same inner join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vedb_gaze_spark.plans import params as P
from vedb_gaze_spark.sources.signals import with_gaze


def _eye_fits(g: DataFrame) -> DataFrame:
    """Per-(user, eye) OLS pupil→gaze fit on high-confidence samples —
    calibrate_2d_binocular's params_eye0/params_eye1 (calibration.py:216),
    linear basis as in calibration_linear."""
    return (
        g.where(F.col("conf") > P.MIN_CONFIDENCE)
        .groupBy("user_id", "eye")
        .agg(
            F.regr_slope("gx", "px").alias("bx"),
            F.regr_intercept("gx", "px").alias("ax"),
            F.regr_slope("gy", "py").alias("by"),
            F.regr_intercept("gy", "py").alias("ay"),
        )
    )


def gaze_map_binocular(
    events: DataFrame,
    cutoff_s: float = P.BINOCULAR_CUTOFF_S,
    pairing: str = "nearest",
) -> DataFrame:
    """Map two interleaved eye streams to gaze: binocular (average of the
    two per-eye mapped positions, mean timestamp/confidence) where both
    eyes have a high-confidence sample within cutoff_s, monocular through
    the sample's own eye fit otherwise. Eye identity is the deterministic
    event_id parity split of the user's stream.

    ``pairing="nearest"`` (default, the registered/oracled form) pairs
    with the temporally nearest other-eye sample in EITHER direction;
    ``pairing="past"`` restricts to the most recent PRECEDING sample —
    the reference's online ``on_pupil_datum`` view of the stream and the
    exact semantics of streaming/stateful.py:streaming_binocular, whose
    cross-batch parity test compares against this mode."""
    g = with_gaze(events).withColumn(
        "eye", (F.col("event_id") % 2).cast("int")
    )
    return gaze_map_binocular_points(g, cutoff_s=cutoff_s, pairing=pairing)


def gaze_map_binocular_points(
    g: DataFrame,
    cutoff_s: float = P.BINOCULAR_CUTOFF_S,
    pairing: str = "nearest",
) -> DataFrame:
    """POINT-TABLE face of gaze_map_binocular (r12, the
    calibration_*_points convention): ``g`` carries (user_id, eye,
    event_id, t, px, py, gx, gy, conf) — per-eye pupil samples with
    their calibration targets, whether from the events signal view
    (the face above, eye = event_id parity) or from two real eye-camera
    detection streams paired against markers
    (plans/profiles.py:run_profile_chain's binocular chain, where
    gx/gy are the paired marker positions). Identical plan to the
    registered face by construction — the face above is one withColumn
    in front of this."""
    fits = _eye_fits(g)
    m = (
        g.join(F.broadcast(fits), ["user_id", "eye"])
        .withColumn("map_x", F.col("ax") + F.col("bx") * F.col("px"))
        .withColumn("map_y", F.col("ay") + F.col("by") * F.col("py"))
        .select("user_id", "eye", "event_id", "t", "conf", "map_x", "map_y")
    )
    hi = F.col("conf") > P.MIN_CONFIDENCE
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    nxt = w.rowsBetween(1, Window.unboundedFollowing)
    # nearest high-confidence sample of each eye, as prev/next frames of
    # the ONE sorted window (the match_nearest union-merge). The window
    # carries the candidate's full STRUCT (t, id, mapped gaze, conf), so
    # the binocular average needs NO partner self-join afterwards —
    # measured: the join-back form paid a second full shuffle of the
    # stream (~2× wall).
    cols = {}
    for e in (0, 1):
        sel = F.when(
            hi & (F.col("eye") == e),
            F.struct(
                F.col("t").alias("t"),
                F.col("event_id").alias("id"),
                F.col("map_x").alias("mx"),
                F.col("map_y").alias("my"),
                F.col("conf").alias("c"),
            ),
        )
        cols[f"p{e}"] = F.last(sel, ignorenulls=True).over(prev)
        cols[f"n{e}"] = F.first(sel, ignorenulls=True).over(nxt)
    m = m.withColumns(cols)
    cp = F.when(F.col("eye") == 0, F.col("p1")).otherwise(F.col("p0"))
    cn = F.when(F.col("eye") == 0, F.col("n1")).otherwise(F.col("n0"))
    if pairing == "past":
        cn = F.lit(None).cast(m.schema["p0"].dataType)
    d_prev = F.col("t") - cp["t"]
    d_next = cn["t"] - F.col("t")
    use_prev = cn.isNull() | (cp.isNotNull() & (d_prev <= d_next))
    m = (
        m.withColumn("pair", F.when(use_prev, cp).otherwise(cn))
        .withColumn("pair_dt", F.when(use_prev, d_prev).otherwise(d_next))
        .select("user_id", "eye", "event_id", "t", "conf", "map_x", "map_y",
                "pair", "pair_dt")
    )
    paired = hi & F.col("pair").isNotNull() & (F.col("pair_dt") <= cutoff_s)
    # eye-0 anchors binocular rows; a paired eye-1 sample is suppressed
    m = m.withColumn(
        "source",
        F.when(~hi, F.concat(F.lit("mono"), F.col("eye")))
        .when(paired & (F.col("eye") == 0), F.lit("binocular"))
        .when(paired & (F.col("eye") == 1), F.lit(None))
        .otherwise(F.concat(F.lit("mono"), F.col("eye"))),
    ).where(F.col("source").isNotNull())
    out = m.withColumns(
        {
            "pt": F.col("pair")["t"],
            "pconf": F.col("pair")["c"],
            "pmap_x": F.col("pair")["mx"],
            "pmap_y": F.col("pair")["my"],
        }
    )
    is_bin = F.col("source") == "binocular"
    return out.select(
        "user_id",
        "event_id",
        "source",
        # NOT rounded: t is exact (integer micros / 1e6, same arithmetic in
        # both engines) and the pair average is exact in binary, while
        # round(x, 6) on the .5e-6 ties the average produces is
        # engine-dependent at this magnitude
        F.when(is_bin, (F.col("t") + F.col("pt")) / 2.0).otherwise(F.col("t")).alias("t_out"),
        F.round(F.when(is_bin, (F.col("map_x") + F.col("pmap_x")) / 2.0).otherwise(F.col("map_x")), 6).alias("gaze_x"),
        F.round(F.when(is_bin, (F.col("map_y") + F.col("pmap_y")) / 2.0).otherwise(F.col("map_y")), 6).alias("gaze_y"),
        F.round(F.when(is_bin, (F.col("conf") + F.col("pconf")) / 2.0).otherwise(F.col("conf")), 6).alias("conf_out"),
    )
