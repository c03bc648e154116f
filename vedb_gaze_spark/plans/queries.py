"""The driver contract: queries() and oracle_sql() registries.

Each entry pairs a Spark plan (builder taking (spark, sf_dir) → DataFrame)
with the DuckDB SQL that computes the identical result on the same parquet
files. Column names and value arithmetic are kept exactly parallel — see
functions/core.py for the cross-engine determinism rules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vedb_gaze_spark.operators import cleaning, relational, smoothing, temporal
from vedb_gaze_spark.plans import oracles
from vedb_gaze_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- relational surface (TPC-H shapes) -----------------------------------

@register("q1_pricing_summary", oracles.Q1)
def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.q1_pricing_summary(load_table(spark, "lineitem", sf_dir))


@register("q3_shipping_priority", oracles.Q3)
def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.q3_shipping_priority(
        load_table(spark, "customer", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "lineitem", sf_dir),
    )


@register("q5_local_supplier", oracles.Q5)
def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.q5_local_supplier(
        load_table(spark, "region", sf_dir),
        load_table(spark, "nation", sf_dir),
        load_table(spark, "customer", sf_dir),
        load_table(spark, "supplier", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "lineitem", sf_dir),
    )


@register("q6_revenue", oracles.Q6)
def _q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.q6_revenue(load_table(spark, "lineitem", sf_dir))


# --- temporal alignment & resampling (SURVEY §2.A) ------------------------

@register("match_nearest", oracles.MATCH_NEAREST)
def _match_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.match_nearest(load_table(spark, "events", sf_dir))


@register("match_window_median", oracles.MATCH_WINDOW_MEDIAN)
def _match_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.match_window_median(load_table(spark, "events", sf_dir))


@register("run_length", oracles.RUN_LENGTH)
def _run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.run_length(load_table(spark, "events", sf_dir))


@register("time_slice", oracles.TIME_SLICE)
def _time_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.time_slice(load_table(spark, "events", sf_dir))


@register("resample_linear", oracles.RESAMPLE_LINEAR)
def _resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.resample_linear(load_table(spark, "events", sf_dir))


# --- cleaning & outliers (SURVEY §2.B) -------------------------------------

@register("outliers_z", oracles.OUTLIERS_Z)
def _outliers_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleaning.outliers_z(load_table(spark, "events", sf_dir))


@register("dedup_timestamps", oracles.DEDUP_TIMESTAMPS)
def _dedup_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleaning.dedup_timestamps(load_table(spark, "events", sf_dir))


@register("brief_detections", oracles.BRIEF_DETECTIONS)
def _brief_detections(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleaning.brief_detections(load_table(spark, "events", sf_dir))


@register("size_filter", oracles.SIZE_FILTER)
def _size_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleaning.size_filter(load_table(spark, "part", sf_dir))


@register("bimodal_filter", oracles.BIMODAL_FILTER)
def _bimodal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleaning.bimodal_filter(load_table(spark, "events", sf_dir))


# --- smoothing (SURVEY §2.B) -----------------------------------------------

@register("detrend_median", oracles.DETREND_MEDIAN)
def _detrend_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smoothing.detrend_median(load_table(spark, "events", sf_dir))


@register("smooth_savgol", oracles.SMOOTH_SAVGOL)
def _smooth_savgol(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smoothing.smooth_savgol(load_table(spark, "events", sf_dir))


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return QUERIES["q1_pricing_summary"](spark, sf_dir)
