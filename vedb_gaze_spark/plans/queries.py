"""The driver contract: queries() and oracle_sql() registries.

Each entry pairs a Spark plan (builder taking (spark, sf_dir) → DataFrame)
with the DuckDB SQL that computes the identical result on the same parquet
files. Column names and value arithmetic are kept exactly parallel — see
functions/core.py for the cross-engine determinism rules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vedb_gaze_spark.operators import relational
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


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return QUERIES["q1_pricing_summary"](spark, sf_dir)
