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
        # The driver regenerates events.parquet between rounds and its ts
        # physical type has varied: TIMESTAMP(NANOS) (which Spark's
        # vectorized reader rejects) and TIMESTAMP(MICROS, isAdjustedToUTC=
        # false) (which Spark 4 infers as TIMESTAMP_NTZ — rejected by
        # unix_micros and hash-hazardous because NTZ→LTZ casts depend on the
        # session time zone). Normalize both at the source:
        #  - nanosAsLong reads NANOS as raw int64, truncated to micros below;
        #  - inferTimestampNTZ=false makes the reader surface naive MICROS
        #    as TIMESTAMP_LTZ carrying the exact stored micros-since-epoch —
        #    bit-identical to DuckDB's epoch interpretation of the same
        #    column, independent of any session's time zone.
        # Both are runtime SQLConfs, safe to set on any session (including
        # the driver's).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def load_events_stream(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Streaming twin of ``load_table(spark, "events")``.

    File-source streams require an explicit schema, which freezes the ts
    physical layout into the reader — so the nanos-vs-micros variation the
    batch loader absorbs must be detected here, from the parquet footer,
    before the stream is declared:

    - TIMESTAMP(NANOS): read raw int64 (``nanosAsLong``) and truncate to a
      micros TIMESTAMP, exactly like the batch path;
    - TIMESTAMP(MICROS, naive): request TimestampType directly — the reader
      surfaces the stored micros-since-epoch verbatim as LTZ, matching the
      batch path's ``inferTimestampNTZ=false`` normalization.

    Either way the stream's schema equals ``load_table``'s, so every batch
    operator composes over this source unchanged.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    sf_dir = sf_dir or DEFAULT_SF_DIR
    ts_type = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    unit = getattr(ts_type, "unit", None)  # 'ns' | 'us' | None (plain int64)
    norm = load_table(spark, "events", sf_dir).schema  # also sets the SQLConfs
    if unit == "us":
        reader = spark.readStream.schema(norm)
        return reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    raw = StructType(
        [
            StructField("ts", LongType(), f.nullable) if f.name == "ts" else f
            for f in norm.fields
        ]
    )
    df = (
        spark.readStream.schema(raw)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
