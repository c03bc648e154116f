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
