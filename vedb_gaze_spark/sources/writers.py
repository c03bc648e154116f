"""Sink-side layouts — partitioned parquet and training shards (SURVEY §4).

The assembly pipeline's OUTPUT layout decides every downstream reader's
scan cost, the way bucketing.py decides the join cost of stored facts:

- write_partitioned: hive-style partitionBy directories give readers
  free partition PRUNING (a lang='en' filter never opens other
  languages' files), and maxRecordsPerFile bounds file size so a
  1000-executor read parallelizes without tiny-file overhead. One
  repartition on the partition columns before the write collapses the
  many-small-files problem (each task would otherwise write one file
  per partition value it happens to hold).

- write_training_shards: the corpus_pipeline sink. Shards are
  directories per source; WITHIN a shard rows are sorted by (pack_id,
  doc_id) so a trainer streams packs in order with zero read-side
  sorting — sortWithinPartitions is a local sort, no extra exchange
  beyond the shard repartition itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple = ("lang",),
    max_records_per_file: int = 100_000,
) -> str:
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return path


def write_training_shards(packed: DataFrame, path: str) -> str:
    """Persist corpus_pipeline output as per-source training shards in
    pack order. Reader contract: each source directory streams packs
    contiguously (pack_id, doc_id ascending) with no sort needed."""
    (
        packed.repartition(F.col("source"))
        .sortWithinPartitions("pack_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("source")
        .parquet(path)
    )
    return path
