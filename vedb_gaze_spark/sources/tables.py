"""Parquet table registry.

Replaces the reference's per-session file loaders (vedb_gaze/utils.py:12
``read_pl_gaze_csv``, odometry.py:27 ``load_odometry`` msgpack reader) with
a single declarative parquet source: Catalyst gets pushdown + pruning for
free, and a 100 TB deployment points ``sf_dir`` at a partitioned lake path
instead of a local directory — nothing else changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables that should always be broadcast when joined.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read the raw int64 nanos and truncate to a micros
        # TIMESTAMP — exactly what DuckDB's reader does internally, so both
        # engines see the same instant. Runtime conf, safe to set on any
        # session (including the driver's).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}
