"""Event-analytics rollups — active users and retention cohorts.

The classic warehouse shapes over the events stream (complementing the
TPC-H surface in relational.py): rolling distinct-user counts and
cohort retention matrices. Day arithmetic is integer epoch-days derived
from exact microseconds via FLOOR division (_floor_div) — timezone-free
and bit-identical to DuckDB's `//` on the same column (Spark's DIV
truncates toward zero, which diverges from DuckDB's floor on
pre-1970 timestamps; the floor form agrees for any sign), per the
loader's timestamp normalization (sources/tables.py:39).

Scale design: everything reduces the stream to the (user, day) distinct
table first — one shuffle on (user_id, day_idx), after which DAU is a
count per day, the trailing-7-day WAU is a bounded 7× explode of that
already-small table (the standard sliding-distinct-window rewrite that
avoids a per-day self-join), and retention is a user-keyed min-join
(co-partitioned groupBy + join on user_id, one exchange shared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vedb_gaze_spark.plans import params as P

_DAY_US = 86_400_000_000


def _floor_div(expr: str, d: int) -> str:
    """Exact-integer FLOOR division as a SQL fragment. Spark's DIV
    truncates toward zero while DuckDB's // floors — they differ on
    negative dividends (pre-1970 timestamps). Subtracting the
    non-negative remainder first makes the numerator an exact multiple
    of d, so truncation == floor on both engines, in pure int64."""
    return f"((({expr}) - (((({expr}) % {d}) + {d}) % {d})) DIV {d})"


def _day_idx() -> "F.Column":
    return F.expr(_floor_div("unix_micros(ts)", _DAY_US))


def _user_days(events: DataFrame) -> DataFrame:
    return (
        events.select("user_id", _day_idx().alias("day_idx"))
        .distinct()
    )


def dau_rollup(events: DataFrame) -> DataFrame:
    """Daily and trailing-7-day active users per epoch-day.

    WAU(d) counts users active in [d-6, d]: each (user, day) activity
    row votes for the 7 target days it can serve, then distinct+count —
    a 7× fanout of the compact user-day table instead of a 7-way
    self-join or a quadratic window. Output keeps only days that have
    activity themselves (inner join with DAU)."""
    ud = _user_days(events)
    dau = ud.groupBy("day_idx").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day_idx"), F.col("day_idx") + F.lit(6))
            ).alias("day_idx"),
        )
        .distinct()
        .groupBy("day_idx")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return dau.join(wau, "day_idx").select("day_idx", "dau", "wau")


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention cohorts: users grouped by their first-activity
    week (absolute epoch-week), counted at each week offset they return.
    offset 0 row = cohort size."""
    ud = _user_days(events)
    first = ud.groupBy("user_id").agg(F.min("day_idx").alias("d0"))
    return (
        ud.join(first, "user_id")
        .select(
            F.expr(_floor_div("d0", 7)).alias("cohort_week"),
            # day_idx - d0 >= 0 by construction (d0 is the user's min),
            # but the floor form costs nothing and can't regress
            F.expr(_floor_div("day_idx - d0", 7)).alias("week_offset"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact per-type distribution summary of the value column: count,
    min/max, and linear-interpolated quartiles + p95 in one aggregation
    pass (percentile with a literal array sorts each group once).

    Percentiles/min/max are order-independent statistics, so they are
    deterministic at any parallelism — unlike a naive avg over doubles,
    which is why the summary deliberately has no mean. Interpolated
    values are rounded to 6 dp on both engines (the lerp's op order is
    engine-internal)."""
    pct = F.expr(
        "percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D))"
    ).alias("pct")
    return (
        events.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("v_min"),
            F.round(F.max("value"), 6).alias("v_max"),
            pct,
        )
        .select(
            "event_type",
            "n",
            "v_min",
            "v_max",
            F.round(F.element_at("pct", 1), 6).alias("p25"),
            F.round(F.element_at("pct", 2), 6).alias("p50"),
            F.round(F.element_at("pct", 3), 6).alias("p75"),
            F.round(F.element_at("pct", 4), 6).alias("p95"),
        )
    )


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Ordered funnel view → click → purchase: users counted at each
    stage they reach, where reaching stage k means the FIRST occurrence
    of stage k's event is at or after the first occurrence of stage
    k-1's (the standard min-timestamp funnel; re-orderings of later
    repeats are out of scope by definition, identically on both
    engines). One groupBy(user) with conditional min aggregates — a
    single corpus-sized shuffle, then a scalar rollup."""
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.unix_micros("ts"))).alias("t1"),
        F.min(F.when(F.col("event_type") == "click", F.unix_micros("ts"))).alias("t2"),
        F.min(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))).alias("t3"),
    )
    s1 = F.col("t1").isNotNull()
    s2 = s1 & F.col("t2").isNotNull() & (F.col("t2") >= F.col("t1"))
    s3 = s2 & F.col("t3").isNotNull() & (F.col("t3") >= F.col("t2"))
    agg = per_user.agg(
        F.sum(s1.cast("long")).alias("stage_view"),
        F.sum(s2.cast("long")).alias("stage_click"),
        F.sum(s3.cast("long")).alias("stage_purchase"),
    )
    return agg.select(
        "stage_view",
        "stage_click",
        "stage_purchase",
        F.round(F.col("stage_purchase") / F.col("stage_view"), 6).alias(
            "conversion"
        ),
    )


def event_transitions(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k event-type transitions: per user, order events by
    (ts, event_id) and count consecutive (from_type → to_type)
    bigrams corpus-wide — the path-analysis rollup behind "what do
    users do next" views (and the event-sequence analogue of
    ngram_topk). One lag window partitioned by user (doc-keyed, no
    global sort), one map-side-combining groupBy over the short
    transition keys, TakeOrderedAndProject for the top-k."""
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    pairs = (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
    )
    ranked = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct("user_id").alias("n_users"),
    )
    top = ranked.orderBy(
        F.desc("n_transitions"), "from_type", "to_type"
    ).limit(k)
    wr = Window.orderBy(F.desc("n_transitions"), "from_type", "to_type")
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "rank", "from_type", "to_type", "n_transitions", "n_users"
    )


def value_anomalies(events: DataFrame) -> DataFrame:
    """Per-user rolling z-score anomalies over event values: an event is
    anomalous when its value sits ≥ ANOM_Z standard deviations from the
    mean of that user's previous ANOM_W events (≥ ANOM_MIN of them) —
    the classic ops-dashboard outlier feed.

    Determinism: values are exact integer cents, so the trailing-frame
    count/sum/sum-of-squares are order-independent integers; mean,
    variance and z are then ONE double expression over those integers,
    identical on any engine and partitioning. One shuffle on user_id;
    the frame is row-bounded so state per user is O(W) regardless of
    history length."""
    from vedb_gaze_spark.functions.core import cents

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-P.ANOM_W, -1)
    )
    u = events.select(
        "event_id", "user_id", "ts", "value", cents("value").alias("u")
    )
    stats = u.select(
        "event_id",
        "user_id",
        "value",
        "u",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.sum("u").over(w).alias("s1"),
        F.sum(F.col("u") * F.col("u")).over(w).alias("s2"),
    ).where(F.col("n_prev") >= P.ANOM_MIN)
    return (
        stats.withColumn(
            "var_num",
            F.expr("s2 - s1 * s1 / cast(n_prev as double)"),
        )
        .where(F.col("var_num") > 0)
        .select(
            "event_id",
            "user_id",
            "value",
            "n_prev",
            F.expr(
                "floor((s1 / cast(n_prev as double)) / 100.0 * 1e6 + 0.5) / 1e6"
            ).alias("mean_prev"),
            F.expr(
                "floor(((u - s1 / cast(n_prev as double)) / "
                "sqrt((s2 - s1 * s1 / cast(n_prev as double)) / cast(n_prev as double))) "
                "* 1e6 + 0.5) / 1e6"
            ).alias("z"),
        )
        .where(F.abs(F.col("z")) >= P.ANOM_Z)
    )


def key_skew_report(events: DataFrame) -> DataFrame:
    """Join-key skew diagnostics for the user_id key: the top SKEW_TOPK
    keys by row count with their share of the stream and ratio to the
    MEDIAN key's count — the number you read before deciding a join
    needs salting. One groupBy on the key; the exact median comes from
    a count-of-counts HISTOGRAM (one row per distinct count value — a
    bounded table even at billion-key cardinality, so its cumulative
    window is metadata-sized), never a global rank over the key table;
    top-k is TakeOrdered, never a global sort of the stream."""
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    hist = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("freq"))
    wcum = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    med = (
        hist.select(
            "cnt",
            F.sum("freq").over(wcum).alias("cum"),
            F.sum("freq").over(Window.partitionBy()).alias("n_keys"),
        )
        .where(F.col("cum") >= F.floor((F.col("n_keys") + 1) / 2))
        .agg(F.min("cnt").alias("median_cnt"))
    )
    total = events.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(total))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(P.SKEW_TOPK)
        .select(
            "user_id",
            "cnt",
            F.expr("floor(cnt / cast(total as double) * 1e6 + 0.5) / 1e6").alias(
                "share"
            ),
            F.expr(
                "floor(cnt / cast(median_cnt as double) * 1e6 + 0.5) / 1e6"
            ).alias("ratio_to_median"),
        )
    )


def funnel_windowed(events: DataFrame, window_s: int = 86400) -> DataFrame:
    """Time-constrained funnel view → click → purchase: stage k counts
    only if its FIRST qualifying event lands within ``window_s`` of the
    previous stage's time (the product-analytics "convert within N
    hours" definition — funnel_conversion is the unwindowed upper
    bound, pytest-pinned). Sequential stage times resolve through
    CHAINED per-user windows (t1 is a per-user constant, so t2's
    conditional min can reference it in the same plan; same for t3) —
    three user-keyed window passes on one scan, one user rollup, one
    scalar rollup; no self-joins."""
    wu = Window.partitionBy("user_id")
    us = int(window_s) * 1_000_000
    e = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("tu")
    )
    e = e.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "view", F.col("tu"))).over(wu),
    )
    e = e.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("tu") >= F.col("t1"))
                & (F.col("tu") <= F.col("t1") + us),
                F.col("tu"),
            )
        ).over(wu),
    )
    e = e.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("tu") >= F.col("t2"))
                & (F.col("tu") <= F.col("t2") + us),
                F.col("tu"),
            )
        ).over(wu),
    )
    per_user = e.groupBy("user_id").agg(
        F.first("t1").alias("t1"),
        F.first("t2").alias("t2"),
        F.first("t3").alias("t3"),
    )
    s1 = F.col("t1").isNotNull()
    s2 = s1 & F.col("t2").isNotNull()
    s3 = s2 & F.col("t3").isNotNull()
    agg = per_user.agg(
        F.sum(s1.cast("long")).alias("stage_view"),
        F.sum(s2.cast("long")).alias("stage_click_w"),
        F.sum(s3.cast("long")).alias("stage_purchase_w"),
    )
    return agg.select(
        "stage_view",
        "stage_click_w",
        "stage_purchase_w",
        F.expr(
            "floor(stage_purchase_w / cast(stage_view as double) * 1e6 + 0.5)"
            " / 1e6"
        ).alias("conversion_w"),
    )


def event_markov(events: DataFrame) -> DataFrame:
    """Full first-order Markov transition matrix over event types
    (event_transitions without the top-k cut): exact bigram counts from
    the same per-user lag window, row-normalized into transition
    probabilities — the "what happens next" model product analytics
    fits on clickstreams (and the input to expected-path simulation).
    Integer counts end-to-end; p quantized half-up 6dp from an exact
    count ratio."""
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    pairs = events.select(
        "user_id",
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    return counts.withColumn("n_from", F.sum("n").over(wf)).select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        F.expr(
            "floor(n / cast(n_from as double) * 1e6 + 0.5) / 1e6"
        ).alias("p"),
    )


def session_paths(events: DataFrame, depth: int = 4, k: int = 15) -> DataFrame:
    """Top-k opening user journeys: each user's FIRST ``depth`` event
    types (by ts, event_id) joined into a path string, counted
    corpus-wide — the "how do sessions start" view behind funnel design
    (event_transitions is its bigram marginal). One user-keyed ranking
    window + per-user array assembly + a short-key rollup +
    TakeOrdered."""
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    firstn = (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= depth)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ).getField("event_type"),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("path_len"),
        )
    )
    ranked = firstn.groupBy("path", "path_len").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    top = ranked.orderBy(F.desc("n_users"), "path").limit(k)
    wr = Window.orderBy(F.desc("n_users"), "path")
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "rank", "path", F.col("path_len").cast("long").alias("path_len"),
        "n_users"
    )


def daily_trend(events: DataFrame) -> DataFrame:
    """Least-squares trend of daily event value (the ops-dashboard
    "are we growing" line): per-day exact integer cents totals, then
    the closed-form slope/intercept over (day_idx, cents) with EXACT
    integer regression sums — day indices and cents are already
    integers, so unlike token_zipf_fit no quantization step is even
    needed; only the final divisions are floats, rounded 6dp. The
    day rollup is corpus-sized work; the regression runs on the
    day-count-sized table."""
    d = events.where(F.col("value").isNotNull()).select(
        _day_idx().alias("x"),
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    days = d.groupBy("x").agg(F.sum("cents").alias("y"))
    agg = days.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.expr(
            "floor((n * sxy - sx * sy) / cast(n * sxx - sx * sx as double)"
            " * 1e6 + 0.5) / 1e6"
        ).alias("slope_cents_per_day"),
        F.expr(
            "floor((sy - (n * sxy - sx * sy) / cast(n * sxx - sx * sx as double)"
            " * sx) / cast(n as double) * 1e6 + 0.5) / 1e6"
        ).alias("intercept_cents"),
    )


def props_rollup(events: DataFrame) -> DataFrame:
    """Schema-on-read over the semi-structured `props` JSON column —
    the modern-engine capability the events table was shipping unused:
    extract `$.k` with the engine's native JSON path (no UDF — Spark's
    get_json_object / DuckDB's json_extract_string, both one codegen'd
    pass over the string column), then roll up per event_type: event
    count, extraction hit count (malformed/missing → NULL, counted
    honestly, never an error), exact integer sum/min/max of k, distinct
    k values, and the 6dp mean over extracted rows.

    Scale: the JSON parse is row-local projection work — it rides the
    existing scan, adds zero shuffles beyond the one event_type rollup,
    and predicate pushdown on the OTHER columns is untouched (the
    extraction never leaves the engine). The mean divides two exact
    longs, the repo's one-float-op discipline."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_extracted"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count_distinct("k").alias("k_distinct"),
        )
        .select(
            "event_type",
            "n_events",
            "n_extracted",
            "k_sum",
            "k_min",
            "k_max",
            "k_distinct",
            F.expr(
                "floor(cast(k_sum as double) / n_extracted * 1e6 + 0.5) / 1e6"
            ).alias("k_mean"),
        )
    )
