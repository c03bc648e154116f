"""Stateful streaming event labeling (SURVEY §2.I item 3).

``streaming_blinks`` is the incremental twin of operators/labeling.py:
detect_blinks (detect_blinks_confidence, labeling.py:444): maximal runs of
sub-threshold confidence, emitted when the run CLOSES (a high-confidence
sample arrives) and its duration falls inside the blink bounds.

The batch version is gaps-and-islands window algebra; a stream can't see
islands that span micro-batches, so the open run lives in per-user
GroupState (start/end time, ids, count) via ``applyInPandasWithState``.
State is O(1) per user — five scalars — regardless of stream length, and
the per-batch work is a vectorizable fold over that user's new rows, so a
1000-executor deployment shards by user_id exactly like the batch plan
shuffles.

Micro-batches are assumed time-ordered per user (the usual contract for
session-state streaming; enforced upstream by the source's log order).
A run still open at end-of-stream stays in state and is never emitted —
tests account for that by closing runs with the batch operator's output
filtered to runs that end before the user's final sample.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vedb_gaze_spark.plans import params as P
from vedb_gaze_spark.sources.signals import with_gaze

OUT_SCHEMA = (
    "user_id bigint, start_event_id bigint, end_event_id bigint, "
    "n_events bigint, duration_s double"
)
STATE_SCHEMA = "t0 double, t1 double, n bigint, id0 bigint, id1 bigint"


def _make_fn(conf_threshold: float, min_s: float, max_s: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.exists:
            t0, t1, n, id0, id1 = state.get
            open_run = True
        else:
            t0 = t1 = 0.0
            n = id0 = id1 = 0
            open_run = False

        closed: list[tuple[int, int, int, int, float]] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t", "event_id"])
        for t, eid, conf in zip(rows["t"], rows["event_id"], rows["conf"]):
            if conf < conf_threshold:
                if open_run:
                    t1, id1, n = t, eid, n + 1
                else:
                    open_run = True
                    t0 = t1 = t
                    id0 = id1 = eid
                    n = 1
            elif open_run:
                dur = t1 - t0
                if min_s <= dur <= max_s:
                    closed.append((user_id, id0, id1, n, dur))
                open_run = False

        if open_run:
            state.update((float(t0), float(t1), int(n), int(id0), int(id1)))
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "start_event_id",
                    "end_event_id",
                    "n_events",
                    "duration_s",
                ],
            )

    return fn


def streaming_blinks(
    events: DataFrame,
    conf_threshold: float = P.BLINK_CONF_THRESHOLD,
    min_s: float = P.BLINK_MIN_S,
    max_s: float = P.BLINK_MAX_S,
) -> DataFrame:
    """Per-user stateful blink detection over a gaze stream."""
    g = with_gaze(events).select("user_id", "event_id", "t", "conf")
    return g.groupBy("user_id").applyInPandasWithState(
        _make_fn(conf_threshold, min_s, max_s),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SAC_OUT_SCHEMA = (
    "user_id bigint, start_event_id bigint, end_event_id bigint, "
    "n_events bigint, duration_s double, peak_vel double, amplitude_deg double"
)
# previous sample (for velocity across batch boundaries) + open run
_SAC_STATE_SCHEMA = (
    "prev_t double, prev_gx double, prev_gy double, "
    "open int, id0 bigint, id1 bigint, n bigint, t0 double, t1 double, "
    "peak double, gx0 double, gy0 double, gx1 double, gy1 double"
)


def _make_saccade_fn(threshold: float, min_s: float, max_s: float):
    deg_h, deg_v = P.DEG_HORIZ, P.DEG_VERT

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        user_id = key[0]
        if state.exists:
            (prev_t, prev_gx, prev_gy, open_run, id0, id1, n, t0, t1,
             peak, gx0, gy0, gx1, gy1) = state.get
            has_prev = True
        else:
            prev_t = prev_gx = prev_gy = 0.0
            open_run, id0, id1, n = 0, 0, 0, 0
            t0 = t1 = peak = gx0 = gy0 = gx1 = gy1 = 0.0
            has_prev = False

        closed: list[tuple] = []

        def close():
            dur = t1 - t0
            if min_s <= dur <= max_s:
                amp = math.sqrt(
                    ((gx1 - gx0) * deg_h) ** 2 + ((gy1 - gy0) * deg_v) ** 2
                )
                closed.append(
                    (user_id, id0, id1, n, dur, round(peak, 6), round(amp, 6))
                )

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t", "event_id"])
        for t, eid, gx, gy in zip(
            rows["t"], rows["event_id"], rows["gx"], rows["gy"]
        ):
            if has_prev:
                dt = t - prev_t
                dx = (gx - prev_gx) * deg_h
                dy = (gy - prev_gy) * deg_v
                dist = math.sqrt(dx * dx + dy * dy)
                vel = dist / dt if dt != 0 else math.inf
                flagged = vel > threshold
            else:
                flagged = False  # first-ever sample has no velocity
            if flagged:
                if open_run:
                    id1, t1, n = eid, t, n + 1
                    gx1, gy1 = gx, gy
                    peak = max(peak, vel)
                else:
                    open_run = 1
                    id0 = id1 = eid
                    t0 = t1 = t
                    n = 1
                    peak = vel
                    gx0, gy0 = gx, gy
                    gx1, gy1 = gx, gy
            elif open_run:
                close()
                open_run = 0
            prev_t, prev_gx, prev_gy, has_prev = t, gx, gy, True

        state.update((
            float(prev_t), float(prev_gx), float(prev_gy), int(open_run),
            int(id0), int(id1), int(n), float(t0), float(t1), float(peak),
            float(gx0), float(gy0), float(gx1), float(gy1),
        ))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "start_event_id", "end_event_id", "n_events",
                    "duration_s", "peak_vel", "amplitude_deg",
                ],
            )

    return fn


_FIX_OUT_SCHEMA = (
    "user_id bigint, start_event_id bigint, end_event_id bigint, "
    "n_events bigint, duration_s double, centroid_x_deg double, "
    "centroid_y_deg double, extent_deg double"
)
_FIX_STATE_SCHEMA = (
    "prev_t double, prev_gx double, prev_gy double, "
    "open int, id0 bigint, id1 bigint, n bigint, t0 double, t1 double, "
    "sgx double, sgy double, mnx double, mxx double, mny double, mxy double"
)


def _make_fixation_fn(
    threshold: float, min_s: float, max_s: float, max_extent: float
):
    deg_h, deg_v = P.DEG_HORIZ, P.DEG_VERT

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        user_id = key[0]
        if state.exists:
            (prev_t, prev_gx, prev_gy, open_run, id0, id1, n, t0, t1,
             sgx, sgy, mnx, mxx, mny, mxy) = state.get
            has_prev = True
        else:
            prev_t = prev_gx = prev_gy = 0.0
            open_run, id0, id1, n = 0, 0, 0, 0
            t0 = t1 = sgx = sgy = mnx = mxx = mny = mxy = 0.0
            has_prev = False

        closed: list[tuple] = []

        def close():
            dur = t1 - t0
            ex = (mxx - mnx) * deg_h
            ey = (mxy - mny) * deg_v
            extent = math.sqrt(ex * ex + ey * ey)
            if min_s <= dur <= max_s and extent <= max_extent:
                closed.append((
                    user_id, id0, id1, n, dur,
                    round(sgx / n * deg_h, 6), round(sgy / n * deg_v, 6),
                    round(extent, 6),
                ))

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t", "event_id"])
        for t, eid, gx, gy in zip(
            rows["t"], rows["event_id"], rows["gx"], rows["gy"]
        ):
            if has_prev:
                dt = t - prev_t
                dx = (gx - prev_gx) * deg_h
                dy = (gy - prev_gy) * deg_v
                dist = math.sqrt(dx * dx + dy * dy)
                vel = dist / dt if dt != 0 else math.inf
                flagged = vel <= threshold
            else:
                flagged = False  # first-ever sample has no velocity
            if flagged:
                if open_run:
                    id1, t1, n = eid, t, n + 1
                    sgx, sgy = sgx + gx, sgy + gy
                    mnx, mxx = min(mnx, gx), max(mxx, gx)
                    mny, mxy = min(mny, gy), max(mxy, gy)
                else:
                    open_run = 1
                    id0 = id1 = eid
                    t0 = t1 = t
                    n = 1
                    sgx, sgy = gx, gy
                    mnx = mxx = gx
                    mny = mxy = gy
            elif open_run:
                close()
                open_run = 0
            prev_t, prev_gx, prev_gy, has_prev = t, gx, gy, True

        state.update((
            float(prev_t), float(prev_gx), float(prev_gy), int(open_run),
            int(id0), int(id1), int(n), float(t0), float(t1),
            float(sgx), float(sgy), float(mnx), float(mxx), float(mny), float(mxy),
        ))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "start_event_id", "end_event_id", "n_events",
                    "duration_s", "centroid_x_deg", "centroid_y_deg",
                    "extent_deg",
                ],
            )

    return fn


def streaming_fixations(
    events: DataFrame,
    threshold: float = P.SACCADE_VEL_THRESHOLD,
    min_s: float = P.FIXATION_MIN_S,
    max_s: float = P.FIXATION_MAX_S,
    max_extent: float = P.FIXATION_MAX_EXTENT_DEG,
) -> DataFrame:
    """Stateful streaming twin of operators/labeling.py:detect_fixations:
    the complement-of-saccade run (velocity <= threshold) with running
    centroid sums and bounding box in state, emitted with the same
    duration + extent gates the moment the run closes. O(1) state per
    user (15 scalars)."""
    g = with_gaze(events).select("user_id", "event_id", "t", "gx", "gy")
    return g.groupBy("user_id").applyInPandasWithState(
        _make_fixation_fn(threshold, min_s, max_s, max_extent),
        outputStructType=_FIX_OUT_SCHEMA,
        stateStructType=_FIX_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_ODO_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, speed_mps double, "
    "speed_mph double, mins_per_mile double"
)
_ODO_STATE_SCHEMA = "prev_t double, px double, py double, pz double"


def _make_odometry_fn():
    from vedb_gaze_spark.operators.odometry import M_PER_MILE, SEC_PER_HR

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        user_id = key[0]
        if state.exists:
            prev_t, px, py, pz = state.get
            has_prev = True
        else:
            prev_t = px = py = pz = 0.0
            has_prev = False

        def r6(v: float) -> float:
            # floor(x*1e6+0.5)/1e6 — exactly the batch operator's
            # engine-portable rounding (operators/odometry.py:_r6; the
            # batch face moved off F.round in r14, which matched this
            # form on every non-tie value)
            return math.floor(v * 1e6 + 0.5) / 1e6

        out: list[tuple] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t", "event_id"])
        for t, eid, x, y, z in zip(
            rows["t"], rows["event_id"], rows["x"], rows["y"], rows["z"]
        ):
            if has_prev and t - prev_t > 0:
                dt = t - prev_t
                mps = math.sqrt(
                    (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
                ) / dt
                out.append((
                    user_id, eid, r6(mps),
                    r6(mps * SEC_PER_HR / M_PER_MILE),
                    # None at zero speed — the batch operator's NULL
                    # (stationary sample; the twin previously emitted
                    # inf, stale vs the r14 batch zero-speed fix)
                    r6(M_PER_MILE / mps / 60.0) if mps > 0 else None,
                ))
            prev_t, px, py, pz, has_prev = t, x, y, z, True

        state.update((float(prev_t), float(px), float(py), float(pz)))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "event_id", "speed_mps",
                    "speed_mph", "mins_per_mile",
                ],
            )

    return fn


def streaming_odometry(events: DataFrame) -> DataFrame:
    """Stateful streaming twin of operators/odometry.py:odometry_speed:
    linear speed needs the PREVIOUS position sample, which in a stream
    lives across micro-batch boundaries — state is one (t, x, y, z)
    tuple per user. Rows with no predecessor or non-advancing timestamps
    emit nothing (the batch operator's null-lag / dt>0 gates), but the
    previous-sample state still advances, exactly like the batch lag."""
    from vedb_gaze_spark.operators.odometry import _positions

    g = _positions(events)
    return g.groupBy("user_id").applyInPandasWithState(
        _make_odometry_fn(),
        outputStructType=_ODO_OUT_SCHEMA,
        stateStructType=_ODO_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_BIN_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, source string, t_out double, "
    "gaze_x double, gaze_y double, conf_out double"
)
# last high-confidence MAPPED sample per eye: 2 structs of 5 scalars
_BIN_STATE_SCHEMA = (
    "t0 double, id0 bigint, mx0 double, my0 double, c0 double, has0 int, "
    "t1 double, id1 bigint, mx1 double, my1 double, c1 double, has1 int"
)


def _make_binocular_fn(
    fits: dict, cutoff_s: float, min_conf: float
):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.exists:
            (t0, id0, mx0, my0, c0, has0,
             t1, id1, mx1, my1, c1, has1) = state.get
        else:
            t0 = mx0 = my0 = c0 = 0.0
            t1 = mx1 = my1 = c1 = 0.0
            id0 = id1 = 0
            has0 = has1 = 0
        last = {
            0: [t0, id0, mx0, my0, c0, has0],
            1: [t1, id1, mx1, my1, c1, has1],
        }

        out: list[tuple] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t", "event_id"])
        for t, eid, conf, px, py in zip(
            rows["t"], rows["event_id"], rows["conf"], rows["px"], rows["py"]
        ):
            eye = int(eid % 2)
            f = fits.get((user_id, eye))
            if f is None:
                # no fit for this eye: the batch form's inner fit join
                # drops these samples too
                continue
            ax, bx, ay, by = f
            mxv = ax + bx * px
            myv = ay + by * py
            if conf <= min_conf:
                out.append((user_id, eid, f"mono{eye}", t,
                            round(mxv, 6), round(myv, 6), round(conf, 6)))
                continue
            ot, _oid, omx, omy, oc, ohas = last[1 - eye]
            paired = bool(ohas) and (t - ot) <= cutoff_s
            if paired and eye == 0:
                out.append((
                    user_id, eid, "binocular", (t + ot) / 2.0,
                    round((mxv + omx) / 2.0, 6),
                    round((myv + omy) / 2.0, 6),
                    round((conf + oc) / 2.0, 6),
                ))
            elif not paired:
                out.append((user_id, eid, f"mono{eye}", t,
                            round(mxv, 6), round(myv, 6), round(conf, 6)))
            # paired eye-1 sample: suppressed (lives in an eye-0 row)
            last[eye] = [t, eid, mxv, myv, conf, 1]

        state.update((
            float(last[0][0]), int(last[0][1]), float(last[0][2]),
            float(last[0][3]), float(last[0][4]), int(last[0][5]),
            float(last[1][0]), int(last[1][1]), float(last[1][2]),
            float(last[1][3]), float(last[1][4]), int(last[1][5]),
        ))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "event_id", "source", "t_out",
                    "gaze_x", "gaze_y", "conf_out",
                ],
            )

    return fn


def streaming_binocular(
    events: DataFrame,
    fits: dict,
    cutoff_s: float = P.BINOCULAR_CUTOFF_S,
    min_conf: float = P.MIN_CONFIDENCE,
) -> DataFrame:
    """Stateful streaming twin of operators/binocular.py:
    gaze_map_binocular(pairing="past") — the reference's online
    ``on_pupil_datum`` semantics (externals/gaze_mappers.py:103): each
    high-confidence sample pairs with the most recent high-confidence
    sample of the OTHER eye if within the cutoff (binocular average,
    anchored on eye 0; the paired eye-1 datum is suppressed), else maps
    monocularly through its own eye's fit.

    ``fits`` is the calibration MODEL — {(user_id, eye): (ax, bx, ay,
    by)} from a prior calibration run (operators/binocular.py:_eye_fits)
    — shipped to executors in the task closure exactly like any inference
    model; there is no per-row driver traffic. State per user is two
    5-scalar structs (last high-confidence mapped sample per eye), O(1)
    for any stream length, sharded by user_id."""
    g = with_gaze(events).select("user_id", "event_id", "t", "conf", "px", "py")
    return g.groupBy("user_id").applyInPandasWithState(
        _make_binocular_fn(fits, cutoff_s, min_conf),
        outputStructType=_BIN_OUT_SCHEMA,
        stateStructType=_BIN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_saccades(
    events: DataFrame,
    threshold: float = P.SACCADE_VEL_THRESHOLD,
    min_s: float = P.SACCADE_MIN_S,
    max_s: float = P.SACCADE_MAX_S,
) -> DataFrame:
    """Stateful streaming twin of operators/labeling.py:detect_saccades
    (find_saccades, labeling.py:615). Velocity needs the PREVIOUS gaze
    sample, which in a stream lives across micro-batch boundaries — so
    state carries (last t, gx, gy) plus the open super-threshold run
    with its running peak velocity and endpoint positions (for the
    amplitude). O(1) state per user; emits a saccade row the moment its
    run closes."""
    g = with_gaze(events).select("user_id", "event_id", "t", "gx", "gy")
    return g.groupBy("user_id").applyInPandasWithState(
        _make_saccade_fn(threshold, min_s, max_s),
        outputStructType=_SAC_OUT_SCHEMA,
        stateStructType=_SAC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_ASOF_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, matched_event_id bigint, dist_sec double"
)
# latest signal event per user: (t, event_id, seen-flag)
_ASOF_STATE_SCHEMA = "sig_t double, sig_id bigint, has int"


def _make_asof_fn(sig_type: str, tolerance: float | None):
    import math

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.exists:
            sig_t, sig_id, has = state.get
        else:
            sig_t, sig_id, has = 0.0, 0, 0

        out: list[tuple] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        # signals sort before refs at equal t — the batch operator's
        # same-instant-qualifies contract
        rows = rows.assign(_k=(rows["event_type"] != sig_type).astype(int))
        rows = rows.sort_values(["t", "_k", "event_id"])
        for t, eid, k in zip(rows["t"], rows["event_id"], rows["_k"]):
            if k == 0:
                # Never regress state: a signal arriving in a LATER
                # micro-batch than a newer one (late data) must not
                # replace it — subsequent refs match the latest signal
                # by (t, event_id), exactly the batch operator's order.
                if not has or (float(t), int(eid)) > (sig_t, sig_id):
                    sig_t, sig_id, has = float(t), int(eid), 1
            elif has and (tolerance is None or t - sig_t <= tolerance):
                d = t - sig_t
                out.append(
                    (user_id, int(eid), sig_id, math.floor(d * 1e6 + 0.5) / 1e6)
                )

        if has:
            state.update((float(sig_t), int(sig_id), 1))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "event_id", "matched_event_id", "dist_sec"],
            )

    return fn


def streaming_match_asof(
    events: DataFrame,
    ref_type: str = "click",
    sig_type: str = "view",
    tolerance: float | None = None,
) -> DataFrame:
    """Stateful streaming twin of operators/temporal.py:match_asof — the
    stream-stream backward as-of join Structured Streaming lacks as a
    built-in. State is the latest signal event per user (2 scalars +
    flag); every ref row joins against that state the moment it arrives,
    so emission is immediate and exact (the batch operator is past-only
    by construction, so cross-batch parity is row-exact, not
    closed-runs-only like the run-labeling twins).

    Late-data contract: the state write is guarded by (t, event_id)
    order, so a signal arriving AFTER a newer signal can never regress
    state — refs always match the newest signal seen. Row-exact batch
    parity additionally assumes per-user refs arrive no earlier than
    signals that precede them in event time (a late-arriving REF pairs
    with the newest stored signal, while the batch twin would pair it
    with the older signal that preceded it; keeping that history would
    need per-user signal buffers, not 2 scalars)."""
    from vedb_gaze_spark.operators.temporal import with_tsec

    e = (
        with_tsec(events)
        .where(F.col("event_type").isin(ref_type, sig_type))
        .select("user_id", "event_id", "event_type", "t")
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _make_asof_fn(sig_type, tolerance),
        outputStructType=_ASOF_OUT_SCHEMA,
        stateStructType=_ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming MinHash-LSH near-dup dedup --------------------------------

_MINHASH_OUT_SCHEMA = "doc_a bigint, doc_b bigint, jaccard double"
# per-band-bucket state: the docs currently alive in this bucket within
# the watermark horizon — ids, full 16-perm signatures (for the min-band
# exactly-once rule), sorted shingle sets (for exact verification), and
# event-time ms (for eviction)
_MINHASH_STATE_SCHEMA = (
    "ids array<bigint>, sigs array<array<bigint>>, "
    "sets array<array<bigint>>, tss array<bigint>"
)


def _make_minhash_lsh_fn(threshold: float, rows_per_band: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        band = int(str(key[0]).split("-", 1)[0])
        if state.exists:
            ids, sigs, sets, tss = state.get
            ids = list(ids)
            sigs = [list(x) for x in sigs]
            sets = [list(x) for x in sets]
            tss = list(tss)
        else:
            ids, sigs, sets, tss = [], [], [], []
        # evict entries the event-time watermark has passed: state is
        # bounded by the dedup horizon, never the stream's history
        wm = state.getCurrentWatermarkMs()
        if wm > 0 and tss:
            keep = [i for i, t in enumerate(tss) if t >= wm]
            if len(keep) < len(ids):
                ids = [ids[i] for i in keep]
                sigs = [sigs[i] for i in keep]
                sets = [sets[i] for i in keep]
                tss = [tss[i] for i in keep]

        out: list[tuple[int, int, float]] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "doc_id"])
        ts_ms = rows["ts"].astype("int64") // 1_000_000
        for doc_id, tms, sig, sset in zip(
            rows["doc_id"], ts_ms, rows["sig"], rows["s"]
        ):
            # plain-int coercion: state pickling rejects numpy scalars
            doc_id = int(doc_id)
            sig = [int(x) for x in sig]
            cur = np.asarray(sset, dtype=np.int64)
            for j, other in enumerate(ids):
                if other == doc_id:
                    continue
                # exactly-once across bands: the pair belongs to the
                # FIRST band whose 4 signature rows collide; later bands
                # skip it (both full signatures are in state/batch)
                osig = sigs[j]
                first = band
                for b2 in range(band):
                    if all(
                        sig[b2 * rows_per_band + r] == osig[b2 * rows_per_band + r]
                        for r in range(rows_per_band)
                    ):
                        first = b2
                        break
                if first != band:
                    continue
                sb = np.asarray(sets[j], dtype=np.int64)
                sa = cur
                if len(sa) > len(sb):
                    sa, sb = sb, sa
                pos = np.searchsorted(sb, sa)
                ok = pos < len(sb)
                inter = int(np.count_nonzero(sb[pos[ok]] == sa[ok]))
                jac = inter / (len(sa) + len(sb) - inter)
                jr = math.floor(jac * 1e6 + 0.5) / 1e6
                if jr >= threshold:
                    out.append(
                        (min(doc_id, other), max(doc_id, other), jr)
                    )
            ids.append(int(doc_id))
            sigs.append(sig)
            sets.append([int(x) for x in sset])
            tss.append(int(tms))

        state.update((ids, sigs, sets, tss))
        if out:
            yield pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    return fn


def streaming_dedup_minhash_lsh(
    documents: DataFrame, watermark_s: float = 7 * 86400.0
) -> DataFrame:
    """Streaming twin of operators/dedup.py:dedup_minhash_lsh — emit each
    verified near-dup pair (doc_a < doc_b, exact full-set Jaccard ≥
    threshold) as soon as the SECOND document of the pair arrives.

    Plan shape: the per-doc shingle set and all 16 permutation minima are
    pure per-row array expressions (no aggregation — streaming-safe), the
    4 band keys explode JVM-side exactly like the batch operator, and the
    stream shards by band_key into `applyInPandasWithState`. State per
    bucket = the docs alive within the event-time watermark horizon
    (ids + signatures + sorted shingle sets), so memory is bounded by the
    dedup horizon × bucket occupancy, never the stream's history — the
    `dropDuplicatesWithinWatermark` contract generalized to pairs.

    Exactly-once without a second stateful operator: a pair colliding in
    several bands is emitted only by the FIRST colliding band — both full
    signatures ride in state, so every band can test the bands before it
    (no cross-partition coordination, no downstream dedup).

    Event time derives from doc_id like streaming_dedup_exact (the
    documents table carries no timestamp); cross-batch parity vs the
    batch operator is exact for pairs whose docs arrive within the
    horizon (tests/test_streaming.py)."""
    from vedb_gaze_spark.operators.dedup import dedup_minhash_lsh

    if not documents.isStreaming:
        return dedup_minhash_lsh(documents)
    k = P.SHINGLE_K
    prime = P.MINHASH_PRIME
    set_expr = (
        "array_sort(array_distinct(transform("
        f"sequence(1, length(t)-{k - 1}), "
        f"i -> cast(conv(substring(md5(substring(t, i, {k})), 1, 15), 16, 10)"
        " as bigint))))"
    )
    sig_expr = F.array(
        *[
            F.expr(
                f"array_min(transform(s, x -> ({a} * (x % {prime}) + {b}) % {prime}))"
            )
            for a, b in P.MINHASH_AB
        ]
    )
    rpb = P.MINHASH_PERMS // P.MINHASH_BANDS
    docs = (
        documents.select(
            "doc_id",
            F.timestamp_micros(
                (F.lit(1_704_067_200) + F.col("doc_id")) * 1_000_000
            ).alias("ts"),
            F.lower("text").alias("t"),
        )
        .where(F.length("t") >= k)
        .withColumn("s", F.expr(set_expr))
        .withColumn("sig", sig_expr)
    )
    key_arr = F.array(
        *[
            F.concat_ws(
                "-",
                F.lit(str(b)),
                *[
                    F.col("sig").getItem(b * rpb + r).cast("string")
                    for r in range(rpb)
                ],
            )
            for b in range(P.MINHASH_BANDS)
        ]
    )
    e = docs.select(
        "doc_id", "ts", "s", "sig", F.explode(key_arr).alias("band_key")
    ).withWatermark("ts", f"{int(watermark_s)} seconds")
    return e.groupBy("band_key").applyInPandasWithState(
        _make_minhash_lsh_fn(P.JACCARD_THRESHOLD, rpb),
        outputStructType=_MINHASH_OUT_SCHEMA,
        stateStructType=_MINHASH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming embedding sign-LSH near-dup dedup --------------------------

_EMB_OUT_SCHEMA = "vec_a bigint, vec_b bigint, cosine double"
_EMB_STATE_SCHEMA = (
    "ids array<bigint>, keys array<array<int>>, "
    "vecs array<array<double>>, tss array<bigint>"
)


def _seq_cosine(a, b) -> float:
    """Left-to-right float64 fold — bit-identical to functions/core.py:
    cosine_similarity's JVM aggregate, so the streaming twin's scores
    round to the batch operator's exact values."""
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _make_embedding_lsh_fn(threshold: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        band = int(str(key[0]).split("-", 1)[0])
        if state.exists:
            ids, keys, vecs, tss = state.get
            ids = list(ids)
            keys = [list(x) for x in keys]
            vecs = [list(x) for x in vecs]
            tss = list(tss)
        else:
            ids, keys, vecs, tss = [], [], [], []
        wm = state.getCurrentWatermarkMs()
        if wm > 0 and tss:
            kept = [i for i, t in enumerate(tss) if t >= wm]
            if len(kept) < len(ids):
                ids = [ids[i] for i in kept]
                keys = [keys[i] for i in kept]
                vecs = [vecs[i] for i in kept]
                tss = [tss[i] for i in kept]

        out: list[tuple[int, int, float]] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "vec_id"])
        ts_ms = rows["ts"].astype("int64") // 1_000_000
        for vec_id, tms, karr, v in zip(
            rows["vec_id"], ts_ms, rows["keys"], rows["v"]
        ):
            vec_id = int(vec_id)
            karr = [int(x) for x in karr]
            v = [float(x) for x in v]
            for j, other in enumerate(ids):
                if other == vec_id:
                    continue
                # min-band exactly-once (the minhash twin's rule): the
                # pair belongs to the first band whose keys collide
                if any(karr[b2] == keys[j][b2] for b2 in range(band)):
                    continue
                c = _seq_cosine(v, vecs[j])
                cr = math.floor(c * 1e6 + 0.5) / 1e6 if c > 0 else round(c, 6)
                if cr >= threshold:
                    out.append((min(vec_id, other), max(vec_id, other), cr))
            ids.append(vec_id)
            keys.append(karr)
            vecs.append(v)
            tss.append(int(tms))

        state.update((ids, keys, vecs, tss))
        if out:
            yield pd.DataFrame(out, columns=["vec_a", "vec_b", "cosine"])

    return fn


def streaming_dedup_embedding_lsh(
    embeddings: DataFrame, watermark_s: float = 7 * 86400.0
) -> DataFrame:
    """Streaming twin of operators/similarity.py:dedup_embedding_lsh —
    emit each exact-cosine near-dup pair once, as soon as the second
    vector arrives.

    Same architecture as streaming_dedup_minhash_lsh: a stateless
    mapInPandas computes all 8 sign-LSH band keys per vector in one
    vectorized numpy pass (identical rounding to the batch keygen), the
    (band, key) fan-out explodes JVM-side, and per-bucket GroupState
    holds the vectors alive within the event-time watermark horizon.
    Scores are bit-identical to the batch operator: a left-to-right
    float64 fold replicates the JVM aggregate, so parity is exact-set,
    not approximate. Exactly-once across bands via the min-band rule
    (all 8 keys ride in state). Event time derives from vec_id (the
    embeddings table carries no timestamp)."""
    from vedb_gaze_spark.operators.similarity import dedup_embedding_lsh

    if not embeddings.isStreaming:
        return dedup_embedding_lsh(embeddings)

    def keygen(batches):
        import numpy as np

        W = np.array(P.DEDUP_LSH_PLANES, dtype=np.float64)
        bands, bits = P.DEDUP_LSH_BANDS, P.DEDUP_LSH_BITS
        weights = 1 << np.arange(bits)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array([list(x) for x in pdf["v"]], dtype=np.float64)
            B = np.round(M @ W.T, 6) > 0
            k = (B.reshape(len(M), bands, bits) * weights).sum(-1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "ts": pdf["ts"],
                    "v": pdf["v"],
                    "keys": [x for x in k.astype(np.int32)],
                }
            )

    v = embeddings.select(
        "vec_id",
        F.timestamp_micros(
            (F.lit(1_704_067_200) + F.col("vec_id")) * 1_000_000
        ).alias("ts"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    keyed = v.mapInPandas(
        keygen, "vec_id bigint, ts timestamp, v array<double>, keys array<int>"
    )
    e = (
        keyed.select(
            "vec_id", "ts", "v", "keys", F.posexplode("keys").alias("band", "key")
        )
        .select(
            "vec_id",
            "ts",
            "v",
            "keys",
            F.concat_ws(
                "-", F.col("band").cast("string"), F.col("key").cast("string")
            ).alias("band_key"),
        )
        .withWatermark("ts", f"{int(watermark_s)} seconds")
    )
    return e.groupBy("band_key").applyInPandasWithState(
        _make_embedding_lsh_fn(P.COSINE_DUP_THRESHOLD),
        outputStructType=_EMB_OUT_SCHEMA,
        stateStructType=_EMB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_PHASH_OUT_SCHEMA = "doc_a bigint, doc_b bigint, hamming int"
_PHASH_STATE_SCHEMA = (
    "ids array<bigint>, keys array<array<int>>, "
    "phs array<bigint>, tss array<bigint>"
)


def _make_phash_fn(max_hamming: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band = int(str(key[0]).split("-", 1)[0])
        if state.exists:
            ids, keys, phs, tss = state.get
            ids = list(ids)
            keys = [list(x) for x in keys]
            phs = list(phs)
            tss = list(tss)
        else:
            ids, keys, phs, tss = [], [], [], []
        wm = state.getCurrentWatermarkMs()
        if wm > 0 and tss:
            kept = [i for i, t in enumerate(tss) if t >= wm]
            if len(kept) < len(ids):
                ids = [ids[i] for i in kept]
                keys = [keys[i] for i in kept]
                phs = [phs[i] for i in kept]
                tss = [tss[i] for i in kept]

        out: list[tuple[int, int, int]] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "doc_id"])
        ts_ms = rows["ts"].astype("int64") // 1_000_000
        for doc_id, tms, karr, ph in zip(
            rows["doc_id"], ts_ms, rows["keys"], rows["ph"]
        ):
            doc_id = int(doc_id)
            karr = [int(x) for x in karr]
            ph = int(ph)
            for j, other in enumerate(ids):
                if other == doc_id:
                    continue
                # min-band exactly-once: the pair belongs to the first
                # band whose keys collide (all keys ride in state)
                if any(karr[b2] == keys[j][b2] for b2 in range(band)):
                    continue
                h = bin(ph ^ phs[j]).count("1")
                if h <= max_hamming:
                    out.append((min(doc_id, other), max(doc_id, other), h))
            ids.append(doc_id)
            keys.append(karr)
            phs.append(ph)
            tss.append(int(tms))

        state.update((ids, keys, phs, tss))
        if out:
            yield pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    return fn


def streaming_phash_dedup(
    documents: DataFrame, watermark_s: float = 7 * 86400.0
) -> DataFrame:
    """Streaming twin of operators/multimodal.py:multimodal_phash_dedup
    — emit each near-dup media pair once, as soon as the second payload
    arrives. The dHash and band keys are the batch operator's shared
    JVM expressions (phash_frame / phash_band_array — fully stateless,
    no Python in the hash path); per-(band, key) GroupState holds
    (doc_id, all-band keys, ph) within the event-time watermark, the
    min-band rule gives exactly-once across bands, and the verify is
    the same integer popcount — parity vs batch is exact-set by
    construction (integer algebra end to end). Event time derives from
    doc_id (the documents table carries no timestamp)."""
    from vedb_gaze_spark.operators.multimodal import (
        multimodal_phash_dedup,
        phash_band_array,
        phash_frame,
    )

    if not documents.isStreaming:
        return multimodal_phash_dedup(documents)

    bands = P.PHASH_BANDS
    rows_per_band = P.PHASH_BITS // bands
    hashed = phash_frame(documents).select(
        "doc_id",
        F.timestamp_micros(
            (F.lit(1_704_067_200) + F.col("doc_id")) * 1_000_000
        ).alias("ts"),
        "ph",
    )
    # build the band array once, then derive both the per-doc key
    # vector (state payload for the min-band rule) and the exploded
    # (band, key) grouping rows from it
    keyed = (
        hashed.withColumn("bk", phash_band_array(bands, rows_per_band))
        .select(
            "doc_id",
            "ts",
            "ph",
            F.expr("transform(bk, s -> cast(s.key as int))").alias("keys"),
            F.explode("bk").alias("b"),
        )
        .select(
            "doc_id",
            "ts",
            "ph",
            "keys",
            F.concat_ws(
                "-",
                F.col("b.band").cast("string"),
                F.col("b.key").cast("string"),
            ).alias("band_key"),
        )
        .withWatermark("ts", f"{int(watermark_s)} seconds")
    )
    return keyed.groupBy("band_key").applyInPandasWithState(
        _make_phash_fn(P.PHASH_MAX_HAMMING),
        outputStructType=_PHASH_OUT_SCHEMA,
        stateStructType=_PHASH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TRANS_OUT_SCHEMA = "user_id bigint, from_type string, to_type string"
_TRANS_STATE_SCHEMA = "last_t bigint, last_id bigint, last_type string, has int"


def _make_transitions_fn():
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.exists:
            last_t, last_id, last_type, has = state.get
        else:
            last_t, last_id, last_type, has = 0, 0, "", 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t_us", "event_id"])
        out_from, out_to = [], []
        for t_us, event_id, etype in zip(
            rows["t_us"], rows["event_id"], rows["event_type"]
        ):
            if has:
                out_from.append(last_type)
                out_to.append(etype)
            last_t, last_id, last_type, has = (
                int(t_us), int(event_id), str(etype), 1
            )
        state.update((last_t, last_id, last_type, has))
        if out_from:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(
                        [user_id] * len(out_from), dtype="int64"
                    ),
                    "from_type": out_from,
                    "to_type": out_to,
                }
            )

    return fn


def streaming_event_transitions(events: DataFrame) -> DataFrame:
    """Stateful streaming twin of analytics.py:event_transitions'
    PAIR-EMISSION stage: the (from_type → to_type) bigram needs the
    user's PREVIOUS event, which lives across micro-batch boundaries —
    state is one (t, event_id, type) triple per user. Emits one row
    per consecutive transition; the top-k rollup head is a plain batch
    aggregation over the emitted pairs (windowed ranking isn't a
    streaming construct — the pair stream is the streamable part, the
    same split streaming_dedup_minhash_lsh makes between pair emission
    and downstream clustering). Cross-batch parity: the multiset of
    emitted pairs equals the batch operator's lag-window pairs.

    PRECONDITION (same class of contract as maintenance.py's doc_id
    uniqueness): each user's events must ARRIVE in event-time order
    across micro-batches. State keeps only the last-ARRIVED event, so
    an earlier-ts event delivered in a later batch would emit a pair
    the batch lag-window operator never produces. Within one batch the
    handler sorts by (t, event_id), so only cross-batch reordering
    violates parity; feed from an ordered log partitioned by user (the
    Kafka-keyed-by-user shape) or sort/buffer with a watermark upstream
    before this operator."""
    g = events.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        "event_type",
    )
    return g.groupBy("user_id").applyInPandasWithState(
        _make_transitions_fn(),
        outputStructType=_TRANS_OUT_SCHEMA,
        stateStructType=_TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- rolling per-user z-score anomalies (analytics.py:value_anomalies) ----

_ANOM_OUT_SCHEMA = (
    "event_id bigint, user_id bigint, value double, n_prev bigint, "
    "mean_prev double, z double"
)
_ANOM_STATE_SCHEMA = "us array<bigint>"


def _make_anomaly_fn(w: int, n_min: int, z_thr: float):
    import math

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        hist: list[int] = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t_us", "event_id"])
        out = {k: [] for k in
               ("event_id", "value", "n_prev", "mean_prev", "z")}
        for event_id, value, u in zip(
            rows["event_id"], rows["value"], rows["u"]
        ):
            u = int(u)
            n = len(hist)
            if n >= n_min:
                s1 = sum(hist)
                s2 = sum(x * x for x in hist)
                # EXACTLY the batch double expression over the same
                # integers: s1*s1 < 2^53 so int/int division equals the
                # JVM's double/double division bit-for-bit
                mean = s1 / n
                var_num = s2 - s1 * s1 / n
                if var_num > 0:
                    z = (u - mean) / math.sqrt(var_num / n)
                    zr = math.floor(z * 1e6 + 0.5) / 1e6
                    if abs(zr) >= z_thr:
                        out["event_id"].append(int(event_id))
                        out["value"].append(float(value))
                        out["n_prev"].append(n)
                        out["mean_prev"].append(
                            math.floor(mean / 100.0 * 1e6 + 0.5) / 1e6
                        )
                        out["z"].append(zr)
            hist.append(u)
            if len(hist) > w:
                hist = hist[-w:]
        state.update((hist,))
        if out["event_id"]:
            yield pd.DataFrame(
                {
                    "event_id": pd.Series(out["event_id"], dtype="int64"),
                    "user_id": pd.Series(
                        [user_id] * len(out["event_id"]), dtype="int64"
                    ),
                    "value": pd.Series(out["value"], dtype="float64"),
                    "n_prev": pd.Series(out["n_prev"], dtype="int64"),
                    "mean_prev": pd.Series(out["mean_prev"], dtype="float64"),
                    "z": pd.Series(out["z"], dtype="float64"),
                }
            )

    return fn


def streaming_value_anomalies(events: DataFrame) -> DataFrame:
    """Stateful streaming twin of analytics.py:value_anomalies — the
    live monitoring shape of the batch report. State per user is the
    last ≤ ANOM_W integer-cents values (one small array, bounded by
    the window width); each arriving event is scored against that
    trailing window with EXACTLY the batch double expression over the
    same exact integers, so emitted anomalies are bit-identical to the
    batch rows for the same data.

    PRECONDITION (the streaming_event_transitions contract): each
    user's events must arrive in event-time order across micro-batches
    — state keeps the last-arrived window. Within a batch the handler
    sorts by (t, event_id)."""
    g = events.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        "value",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("u"),
    )
    return g.groupBy("user_id").applyInPandasWithState(
        _make_anomaly_fn(P.ANOM_W, P.ANOM_MIN, P.ANOM_Z),
        outputStructType=_ANOM_OUT_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_PHASED_OUT_SCHEMA = (
    "user_id bigint, start_event_id bigint, end_event_id bigint, "
    "close_s double, closure_s double, open_s double, duration_s double"
)
# prev sample (velocity across batch boundaries) + the open phase run
# + the TWO most recently completed runs (the c[,m] history an o-run
# completion pattern-matches against) — O(1) per user, ~3 runs deep.
_PHASED_STATE_SCHEMA = (
    "has_prev int, prev_t double, prev_frac double, "
    "open int, ph int, t0 double, t1 double, id0 bigint, id1 bigint, "
    "r1v int, r1p int, r1t0 double, r1t1 double, r1id0 bigint, r1id1 bigint, "
    "r2v int, r2p int, r2t0 double, r2t1 double, r2id0 bigint, r2id1 bigint"
)
_PH_C, _PH_M, _PH_O = 0, 1, 2


def _eyelid_dist_py(event_ids, ct: float, st: float):
    """Python twin of operators/eyelid.py:eyelid_distance for one user:
    the deterministic keypoints are integer arithmetic and the gap is
    plain IEEE double math, so numpy reproduces the JVM bit-for-bit;
    the one non-trivial piece is Spark's round(x, 6), which goes
    through BigDecimal.valueOf(double) (shortest decimal repr) then
    HALF_UP — Decimal(repr(x)).quantize(1e-6, ROUND_HALF_UP) is the
    exact Python equivalent."""
    import decimal

    import numpy as np

    from vedb_gaze_spark.operators.eyelid import N_KPTS

    k = np.asarray(event_ids, dtype=np.int64)[:, None]
    j = np.arange(N_KPTS, dtype=np.int64)[None, :]
    xu = j * 10.0 + ((k * 7129 + j * 31) % 100) / 50.0
    xl = j * 10.0 + ((k * 6037 + j * 37) % 100) / 50.0
    yu = 20.0 + ((k * 8191 + j * 101) % 300) / 10.0
    yl = -20.0 - ((k * 4099 + j * 103) % 300) / 10.0
    gap = ct * (yu - yl) - st * (xu - xl)
    mx = gap.max(axis=1)
    q = decimal.Decimal("0.000001")
    return np.array(
        [
            float(
                decimal.Decimal(repr(v)).quantize(
                    q, rounding=decimal.ROUND_HALF_UP
                )
            )
            for v in mx
        ]
    )


def _make_phased_fn(model: dict, neg_vel: float, pos_vel: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        m = model.get(user_id)
        if m is None:
            # frozen model predates this user: no normalization exists,
            # so no phase can be classified — route to re-fit, exactly
            # the score_label_margins unseen-label discipline
            return
        ct, st, max_dist = m
        if state.exists:
            (has_prev, prev_t, prev_frac,
             open_, ph, t0, t1, id0, id1,
             r1v, r1p, r1t0, r1t1, r1id0, r1id1,
             r2v, r2p, r2t0, r2t1, r2id0, r2id1) = state.get
        else:
            has_prev = open_ = r1v = r2v = 0
            ph = r1p = r2p = 0
            prev_t = prev_frac = t0 = t1 = 0.0
            r1t0 = r1t1 = r2t0 = r2t1 = 0.0
            id0 = id1 = r1id0 = r1id1 = r2id0 = r2id1 = 0

        out: list[tuple] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t", "event_id"])
        dist = _eyelid_dist_py(rows["event_id"].to_numpy(), ct, st)

        def complete_run():
            """Close the open run; if it is an OPENING run, pattern-match
            the batch plan's c,o / c,m,o lead() join and gate-emit."""
            nonlocal r1v, r1p, r1t0, r1t1, r1id0, r1id1
            nonlocal r2v, r2p, r2t0, r2t1, r2id0, r2id1
            if ph == _PH_O and r1v:
                direct = r1p == _PH_C
                via_mid = r1p == _PH_M and r2v and r2p == _PH_C
                if direct or via_mid:
                    if direct:
                        c_t0, c_t1, c_id0 = r1t0, r1t1, r1id0
                        closure_s = 0.0
                    else:
                        c_t0, c_t1, c_id0 = r2t0, r2t1, r2id0
                        closure_s = r1t1 - r1t0
                    close_s = c_t1 - c_t0
                    open_s = t1 - t0
                    duration_s = t1 - c_t0
                    if (
                        P.BLINK_CLOSE_MIN_S <= close_s <= P.BLINK_CLOSE_MAX_S
                        and closure_s <= P.BLINK_CLOSURE_MAX_S
                        and open_s >= P.BLINK_OPEN_MIN_S
                        and P.BLINK_MIN_S <= duration_s <= P.BLINK_MAX_S
                    ):
                        out.append(
                            (user_id, c_id0, id1, close_s,
                             closure_s, open_s, duration_s)
                        )
            r2v, r2p, r2t0, r2t1, r2id0, r2id1 = (
                r1v, r1p, r1t0, r1t1, r1id0, r1id1
            )
            r1v, r1p, r1t0, r1t1, r1id0, r1id1 = 1, ph, t0, t1, id0, id1

        for t, eid, d in zip(rows["t"], rows["event_id"], dist):
            frac = d / max_dist
            if not has_prev:
                has_prev, prev_t, prev_frac = 1, t, frac
                continue
            vel = (frac - prev_frac) / (t - prev_t)
            prev_t, prev_frac = t, frac
            p = _PH_C if vel <= neg_vel else (
                _PH_O if vel >= pos_vel else _PH_M
            )
            if open_ and p == ph:
                t1, id1 = t, eid
            else:
                if open_:
                    complete_run()
                open_, ph = 1, p
                t0 = t1 = t
                id0 = id1 = eid

        state.update((
            int(has_prev), float(prev_t), float(prev_frac),
            int(open_), int(ph), float(t0), float(t1), int(id0), int(id1),
            int(r1v), int(r1p), float(r1t0), float(r1t1),
            int(r1id0), int(r1id1),
            int(r2v), int(r2p), float(r2t0), float(r2t1),
            int(r2id0), int(r2id1),
        ))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "start_event_id", "end_event_id",
                    "close_s", "closure_s", "open_s", "duration_s",
                ],
            )

    return fn


def streaming_blinks_phased(
    events: DataFrame,
    model: dict[int, tuple[float, float, float]],
    neg_vel: float = P.EYELID_NEG_VEL,
    pos_vel: float = P.EYELID_POS_VEL,
) -> DataFrame:
    """Stateful streaming twin of operators/eyelid.py:
    detect_blinks_phased (r11, r10 verdict #5 — the one blink face
    without a §2.I twin): the three-phase closing/closure/opening
    state machine carried per user in GroupState — the open phase run
    plus the two most recently completed runs, which is exactly the
    history the batch plan's lead()/lead(,2) pattern join inspects
    when an opening run completes.

    ``model`` is the FROZEN per-user normalization
    {user_id: (ct, st, max_dist)} from operators/eyelid.py:
    eyelid_model — the PCA rotation and max eye opening are
    whole-history statistics, so the stream consumes them as compiled
    model state (the label_centroids / nb_lang_id frozen-model
    discipline); users missing from the model emit nothing (route to
    re-fit). A blink is emitted when its OPENING run completes (the
    next non-opening sample arrives) — a run still open at
    end-of-stream stays in state, the module-wide contract.

    PRECONDITION (the streaming_event_transitions contract): per-user
    event-time order across micro-batches; within a batch the handler
    sorts by (t, event_id)."""
    from vedb_gaze_spark.functions.core import tsec

    g = events.select(
        "user_id",
        "event_id",
        tsec("ts").alias("t"),
    )
    return g.groupBy("user_id").applyInPandasWithState(
        _make_phased_fn(dict(model), neg_vel, pos_vel),
        outputStructType=_PHASED_OUT_SCHEMA,
        stateStructType=_PHASED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
