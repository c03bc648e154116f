"""JSONL ingest with explicit schema and corrupt-record capture.

Raw training corpora arrive as JSON-lines dumps long before they are
parquet; the ingest contract at 100 TB is (a) NEVER infer the schema —
inference is a full extra pass over the data and locks in whatever the
first files happened to contain — and (b) never silently drop a bad
line: PERMISSIVE mode parses what it can and lands the raw text of
unparseable records in a quarantine column for audit, so ingest is
lossless and idempotent. Schema enforcement + quarantine is the
file-format analog of the loader normalization in tables.py:39.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Parse a JSONL corpus dump against the fixed schema. Returns rows
    with the quarantine column: NULL for clean rows, the raw line for
    corrupt ones (which have every data column NULL)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(
    parsed: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean rows without the quarantine column, quarantined raw lines,
    cached parsed handle).

    Spark refuses queries that reference ONLY the corrupt-record column
    of a raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented
    contract is to materialize first. cache() here is ingest-batch
    scoped, not corpus-resident: the parsed batch is read exactly twice
    (clean + quarantine split). The third element is the CACHED handle —
    once both splits are written, `handle.unpersist()` evicts the batch
    so repeated ingest calls don't accumulate executor storage for the
    life of the session."""
    parsed = parsed.cache()
    clean = parsed.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = parsed.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad, parsed
