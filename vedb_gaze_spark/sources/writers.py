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
    files_per_partition: int = 8,
) -> str:
    """Repartitioning on the bare partition columns would cap write
    parallelism at the number of distinct values (5 languages → 5
    tasks); a deterministic hash-salt over the full row spreads each
    partition's rows over ``files_per_partition`` write tasks while
    keeping the file count per directory bounded."""
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(files_per_partition)
    )
    (
        df.repartition(*[F.col(c) for c in partition_cols], salt)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return path


def write_training_shards(packed: DataFrame, path: str) -> str:
    """Persist corpus_pipeline output as per-source training shards in
    pack order. Reader contract: each file streams packs contiguously
    ((shard, pack_id, doc_id) ascending) with no sort needed.

    One write task per (source, shard) — greedy_pack's own group bound
    is the unit of write parallelism, so a hot source's shards write in
    parallel while each file still holds whole shards in pack order
    (salting instead would split packs across files with no cross-file
    order guarantee)."""
    (
        packed.repartition(F.col("source"), F.col("shard"))
        # source leads the sort so the write path's own partition-column
        # ordering requirement is satisfied as-is — FileFormatWriter
        # would otherwise re-sort by source alone, unstably, destroying
        # the (shard, pack_id, doc_id) stream order inside each file
        .sortWithinPartitions("source", "shard", "pack_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("source")
        .parquet(path)
    )
    return path


def compact_table(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> str:
    """Small-file compaction — the maintenance job every streaming /
    incremental sink eventually needs (each micro-batch directory and
    each incremental append adds files; a 100 TB table ingested in
    10 MB micro-batch files makes every scan open 10^7 handles and
    schedule 10^7 splits).

    Reads the table, re-partitions to ceil(input_bytes / target_bytes)
    round-robin partitions (size from the file system, not a guess —
    Hadoop FS contentSummary), and rewrites with one file per task.
    Round-robin (not keyed) because compaction must balance file SIZES
    regardless of value skew; layout-aware compaction (bucketed /
    sorted tables) belongs to the bucketing writers, which rewrite
    through their own layout contracts instead.

    Writes to ``out_path`` (default: path + '.compact') rather than
    in place — an in-place overwrite that fails mid-write destroys the
    table; callers swap directories after success (the same
    versioned-directory discipline streaming/maintenance.py uses)."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    size = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(size / target_bytes))
    dst = out_path or path.rstrip("/") + ".compact"
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dst)
    return dst
