"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) smoke-runs the flagship query at sf0.001; queries() /
oracle_sql() expose every implemented operator from SURVEY.md §2 with its
DuckDB oracle. Implementation lives in vedb_gaze_spark/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vedb_gaze_spark.plans import queries as _plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape pricing summary) on sf0.001."""
    return _plans.flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_plans.ORACLES)
