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


def _zbucket_expr(col: str, mn: float, mx: float, bits: int) -> str:
    """Per-dimension bucket id: the value's position in [mn, mx] scaled
    to 2^bits cells, clamped — computable from a PREDICATE's constants
    alone, which is what makes read-side pruning possible."""
    span = float(mx) - float(mn)
    if span <= 0:
        return "0"
    return (
        f"least(greatest(cast(floor((cast({col} as double) - {float(mn)!r})"
        f" / {span!r} * {1 << bits}) as int), 0), {(1 << bits) - 1})"
    )


def _z_interleave(b1: str, b2: str, bits: int) -> str:
    """Bit-interleave two bucket ids into one Morton (z-order) code —
    non-overlapping bit positions, so + is |; all integer codegen."""
    terms = []
    for k in range(bits):
        terms.append(f"(((({b1}) >> {k}) & 1) << {2 * k})")
        terms.append(f"(((({b2}) >> {k}) & 1) << {2 * k + 1})")
    return " + ".join(terms)


def write_zorder_layout(
    df: DataFrame,
    path: str,
    dim1: tuple,
    dim2: tuple,
    bits: int = 4,
) -> None:
    """Two-dimensional Z-ORDER data layout (the Morton-curve clustering
    behind Delta/Iceberg's OPTIMIZE ZORDER, here as an explicit hive
    partition column): each row's (dim1, dim2) values bucket into a
    2^bits × 2^bits grid whose cell ids interleave into ONE `zbucket`
    partition column. A reader filtering a RECTANGLE in (dim1, dim2)
    space touches only the covering z-cells' directories — file-level
    pruning on TWO dimensions from ONE partition key, without the
    directory explosion of partitionBy(dim1_bucket, dim2_bucket)
    nesting at higher dimensionality.

    dimN = (column, min, max) with numeric columns; the grid geometry
    is persisted at {path}/zmeta (the self-describing-index pattern:
    pruning constants must travel with the data they describe). The
    layout is SELF-VERIFYING on read: read_zorder_pruned re-applies the
    exact predicate, so correctness never depends on the pruning math.
    One repartition on zbucket collapses the many-small-files problem
    exactly as write_partitioned does."""
    (c1, mn1, mx1), (c2, mn2, mx2) = dim1, dim2
    z = _z_interleave(
        _zbucket_expr(c1, mn1, mx1, bits),
        _zbucket_expr(c2, mn2, mx2, bits),
        bits,
    )
    (
        df.withColumn("zbucket", F.expr(z))
        .repartition("zbucket")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(f"{path}/data")
    )
    spark = df.sparkSession
    spark.createDataFrame(
        [(c1, float(mn1), float(mx1), c2, float(mn2), float(mx2), int(bits))],
        "c1 string, mn1 double, mx1 double, c2 string, mn2 double,"
        " mx2 double, bits int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/zmeta")


def read_zorder_pruned(
    spark,
    path: str,
    r1: tuple,
    r2: tuple,
) -> DataFrame:
    """Rectangle query over a write_zorder_layout store: enumerate the
    z-cells covering [r1] × [r2] from the persisted grid geometry
    (driver-side PARTITION METADATA — ≤ 2^2bits ints, the IVFPQ
    probed-cells pattern, never data), push `zbucket IN (covering)`
    into the scan as a PartitionFilter, and re-apply the exact range
    predicate on top. Rows are exactly those of the unpartitioned
    filter; only the I/O differs (inputFiles ⊂ all files, pytest-pinned)."""
    m = spark.read.parquet(f"{path}/zmeta").collect()[0]
    bits = int(m["bits"])
    ncells = 1 << bits

    def brange(lo, hi, mn, mx):
        span = mx - mn
        if span <= 0:
            return [0]
        blo = min(max(int((lo - mn) / span * ncells), 0), ncells - 1)
        bhi = min(max(int((hi - mn) / span * ncells), 0), ncells - 1)
        return list(range(blo, bhi + 1))

    def interleave(b1: int, b2: int) -> int:
        z = 0
        for k in range(bits):
            z |= ((b1 >> k) & 1) << (2 * k)
            z |= ((b2 >> k) & 1) << (2 * k + 1)
        return z

    covering = sorted(
        interleave(b1, b2)
        for b1 in brange(r1[0], r1[1], m["mn1"], m["mx1"])
        for b2 in brange(r2[0], r2[1], m["mn2"], m["mx2"])
    )
    data = spark.read.parquet(f"{path}/data")
    return data.where(F.col("zbucket").isin(covering)).where(
        (F.col(m["c1"]) >= r1[0])
        & (F.col(m["c1"]) <= r1[1])
        & (F.col(m["c2"]) >= r2[0])
        & (F.col(m["c2"]) <= r2[1])
    )


def write_stats_layout(
    df: DataFrame,
    path: str,
    stat_col: str,
    n_files: int = 16,
) -> None:
    """FILE-LEVEL min/max statistics manifest — the data-skipping layer
    of Delta/Iceberg table formats (Delta's per-file stats in the
    transaction log; Iceberg's manifest-file column bounds), re-derived
    on plain parquet. Parquet footers already carry row-group min/max,
    but a reader must OPEN every footer to use them; a table-format
    manifest answers "which files can contain x ∈ [lo, hi]" from one
    tiny sidecar read — at 10^5 files that is the difference between
    10^5 footer round-trips and one metadata scan.

    Skipping only pays when values are CLUSTERED into files, so the
    writer range-partitions on stat_col first (Delta OPTIMIZE's
    clustering step): each of the n_files write tasks holds one tight
    value range. The manifest ({path}/manifest: file, mn, mx, rows) is
    computed in one pass over the written files via input_file_name()
    — per-file rollup, never a collect of data rows.

    Re-cluster over an APPENDED store (the documented compact_table
    flow) must not leave a stale higher manifest_vN behind: the data/
    overwrite invalidates every old manifest's file list, so the fresh
    manifest is written as v{N+1} of whatever version currently
    resolves (v1 on a virgin store) and older versions are GC'd —
    the same promotion discipline as append_stats_layout."""
    spark = df.sparkSession
    try:
        next_v = _manifest_version(manifest_dir(spark, path)) + 1
    except FileNotFoundError:
        next_v = 1
    d = df.repartitionByRange(n_files, F.col(stat_col))
    d.write.mode("overwrite").parquet(f"{path}/data")
    (
        spark.read.parquet(f"{path}/data")
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(stat_col).alias("mn"),
            F.max(stat_col).alias("mx"),
            F.count(F.lit(1)).alias("rows"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/manifest_v{next_v}")
    )
    gc_versioned_dirs(spark, path, "manifest", keep_from=next_v)


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path-class) pair for the store's filesystem."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), jvm.org.apache.hadoop.fs.Path


def versioned_dir(spark, path: str, prefix: str = "manifest") -> str:
    """Resolve the CURRENT `{prefix}_v{N}` sidecar of a store: the
    highest-numbered version whose `_SUCCESS` commit marker exists
    (Spark's parquet committer writes it last, so a version is either
    invisible or complete), falling back to the legacy unversioned
    `{prefix}` dir. This is the Delta/Iceberg log-version discipline
    applied to the sidecar: the writer PROMOTES a new version by
    creating it, never by a delete-then-rename window in which no
    sidecar exists — a concurrent reader always resolves a complete
    one. Shared by the stats-layout manifest and the epoch-order
    offsets sidecar."""
    fs, P_ = _hadoop_fs(spark, path)
    vpfx = f"{prefix}_v"
    best, best_n = None, -1
    unmarked, unmarked_n = None, -1
    root = P_(path)
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith(vpfx) and name[len(vpfx):].isdigit():
                n = int(name[len(vpfx):])
                if n > best_n and fs.exists(P_(f"{path}/{name}/_SUCCESS")):
                    best, best_n = f"{path}/{name}", n
                if n > unmarked_n and any(
                    f.getPath().getName().endswith(".parquet")
                    for f in fs.listStatus(st.getPath())
                ):
                    unmarked, unmarked_n = f"{path}/{name}", n
    if best is None and unmarked is not None:
        # Committers with marksuccessfuljobs=false never write _SUCCESS;
        # a complete version is then recognized by its part files. Gate
        # the fallback on that config ACTUALLY being off (ADVICE r10):
        # under the default committer, part files without _SUCCESS mean
        # a job crashed mid-write of its first version, and silently
        # resolving that partial file list would break the module's 'a
        # version is either invisible or complete' invariant — there the
        # loud FileNotFoundError below is correct.
        marks = spark._jsc.hadoopConfiguration().get(
            "mapreduce.fileoutputcommitter.marksuccessfuljobs", "true"
        )
        if str(marks).lower() == "false":
            best = unmarked
    if best is None:
        legacy = f"{path}/{prefix}"
        if not fs.exists(P_(legacy)):
            raise FileNotFoundError(f"no {prefix} under {path}")
        return legacy
    return best


def manifest_dir(spark, path: str) -> str:
    return versioned_dir(spark, path, "manifest")


def _manifest_version(sidecar_path: str, prefix: str = "manifest") -> int:
    name = sidecar_path.rstrip("/").split("/")[-1]
    vpfx = f"{prefix}_v"
    return int(name[len(vpfx):]) if name.startswith(vpfx) else 0


def gc_versioned_dirs(
    spark, path: str, prefix: str, keep_from: int, protect: str = ""
) -> None:
    """Delete `{prefix}_v{N}` sidecar versions older than keep_from
    (and the legacy unversioned dir). keep_from = N keeps v{N},
    v{N+1}, ... — callers pass next_v-1 to retain one prior generation
    for in-flight readers, or next_v when the data those readers would
    list is gone anyway (full re-cluster overwrote data/). `protect`
    exempts one path (the legacy dir when it is the retained prior
    generation)."""
    fs, P_ = _hadoop_fs(spark, path)
    vpfx = f"{prefix}_v"
    for st in fs.listStatus(P_(path)):
        name = st.getPath().getName()
        stale = (
            name.startswith(vpfx)
            and name[len(vpfx):].isdigit()
            and int(name[len(vpfx):]) < keep_from
        ) or name in (prefix, f"{prefix}.new")
        if stale and f"{path}/{name}" != protect:
            fs.delete(st.getPath(), True)


def read_stats_pruned(spark, path: str, stat_col: str, lo, hi) -> DataFrame:
    """Range query over a write_stats_layout store: select the files
    whose [mn, mx] overlaps [lo, hi] FROM THE MANIFEST (driver-side
    file-list metadata — the partition-pruning decision Delta/Iceberg
    make from their logs), read only those, and re-apply the exact
    predicate so correctness never depends on the manifest (the
    Z-order self-verifying-read discipline). Returns exactly the rows
    of the unpartitioned filter; only the I/O differs (files read ⊂
    all files, pytest-pinned)."""
    manifest = spark.read.parquet(manifest_dir(spark, path))
    keep = [
        r["file"]
        for r in manifest.where(
            (F.col("mn") <= hi) & (F.col("mx") >= lo)
        ).collect()
    ]
    if not keep:
        return (
            spark.read.parquet(f"{path}/data")
            .where(F.lit(False))
        )
    return spark.read.parquet(*keep).where(
        (F.col(stat_col) >= lo) & (F.col(stat_col) <= hi)
    )


def append_stats_layout(
    df_new: DataFrame, path: str, stat_col: str, n_files: int = 4
) -> None:
    """Grow a write_stats_layout store without rewriting it — the
    manifest analog of append_gram_index / append_ivfpq_index (every
    stored layout in this repo is append-maintainable; a nightly ingest
    cannot re-cluster 100 TB). The new batch range-clusters into its own
    n_files tight-range files (APPENDed — pre-existing data files stay
    byte-identical), their (file, mn, mx, rows) stats are computed by
    scanning ONLY the new files, and the manifest is rewritten as old
    manifest rows ∪ new rows (the manifest is metadata-sized — that
    rewrite is the cheap part, exactly like Delta's log append).

    Append-clustering note: old and new file RANGES may overlap (each
    batch clusters within itself), which degrades pruning selectivity,
    never correctness — read_stats_pruned keeps the exact re-filter.
    Periodic re-cluster = write_stats_layout over the read-back (the
    compact_table discipline)."""
    spark = df_new.sparkSession
    cur_manifest = manifest_dir(spark, path)
    old_manifest = spark.read.parquet(cur_manifest).collect()
    old_files = {r["file"] for r in old_manifest}
    (
        df_new.repartitionByRange(n_files, F.col(stat_col))
        .write.mode("append")
        .parquet(f"{path}/data")
    )
    all_files = set(spark.read.parquet(f"{path}/data").inputFiles())
    new_files = sorted(
        f
        for f in all_files
        if f not in old_files
        # inputFiles() and input_file_name() agree on this FS; guard
        # against URI-normalization drift by suffix comparison too
        and not any(f.split("/")[-1] == o.split("/")[-1] for o in old_files)
    )
    fresh = (
        spark.read.parquet(*new_files)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(stat_col).alias("mn"),
            F.max(stat_col).alias("mx"),
            F.count(F.lit(1)).alias("rows"),
        )
    )
    merged = spark.createDataFrame(
        old_manifest, fresh.schema
    ).unionByName(fresh)
    # Versioned promotion (never a no-manifest window): write the merged
    # manifest as version N+1 — _SUCCESS lands last, so readers resolve
    # either N (still complete) or N+1, and a crash mid-write leaves N
    # untouched. Versions OLDER than N are then garbage-collected; N
    # itself is kept one generation so an in-flight reader that already
    # resolved it can finish its file-list scan (the Delta log-retention
    # idea at depth 1).
    next_v = _manifest_version(cur_manifest) + 1
    merged.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/manifest_v{next_v}"
    )
    gc_versioned_dirs(
        spark, path, "manifest", keep_from=next_v - 1, protect=cur_manifest
    )
