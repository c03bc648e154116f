"""Streaming incremental dedup-index + cluster maintenance (SURVEY §7).

The nightly-append story, made continuous: documents stream in;
every micro-batch (a) extends the stored MinHash index (doc sets +
band keys) with the batch's rows, (b) emits exactly the verified
near-dup pairs the batch introduces (dedup_minhash_incremental —
new×index ∪ new×new, never index×index), and (c) folds those pairs
into the stored (doc_id, cluster_id, cluster_size) assignment with
dedup_clusters_incremental — the contracted-graph solve that never
re-solves, shuffles, or broadcasts the stored corpus side.

Reference composition this replaces: vedb-gaze has no incremental
path at all — every pydra pipeline run recomputes from per-session
files (pipelines.py run_pipeline); this module is the lakehouse-native
upgrade the 100 TB ingest shape needs.

State layout (any Hadoop-visible filesystem):

    {state_dir}/doc_sets/batch={id}/     append-only, one dir per micro-batch
    {state_dir}/band_keys/batch={id}/    append-only, same ids
    {state_dir}/pairs/batch={id}/        the batch's emitted pairs (observable output)
    {state_dir}/clusters/bucket={k}/v={id}/  hash(doc_id) bucket k of the
                                         assignment, as last rewritten by
                                         batch {id}; ONLY buckets the batch
                                         touches get a new version
    {state_dir}/clusters/cindex/bucket={k}/v={id}/  the bucket's DISTINCT
                                         cluster ids (the cluster→bucket
                                         side index), written beside every
                                         bucket rewrite — cluster-granular,
                                         so discovery reads never scan
                                         doc-granular assignment rows
    {state_dir}/clusters/_commits/batch={id}/  commit marker, written LAST

Exactly-once without a transaction log: every write is an idempotent
overwrite of a directory named by the Structured Streaming batch_id,
and every read of prior state filters to COMMITTED ids strictly below
the current batch — a replayed batch (crash between writes, marker
absent) sees exactly the state its first attempt saw and rewrites the
same dirs. Batch ids from one checkpointed query are monotonic, which
is all the versioning needed; the commit marker additionally gives
every reader a consistent snapshot (per-bucket max version ≤ the last
committed batch), so partially-written buckets of an in-flight or
crashed batch are never visible.

Scale shape per micro-batch: index-side work is the band-key probe +
verify equi-join only (stored band keys are read as-is — the
write_band_keys_bucketed economics, here maintained for free because
each batch writes its own keys on arrival); the CC solve sees only the
contracted O(batch) graph; and the assignment WRITE is partition-pruned
— the batch-sized patch tables (_clusters_incremental_parts) are
applied per affected hash(doc_id) bucket, reading and rewriting ONLY
buckets that hold a relabeled/size-patched/new row (untouched buckets'
files are byte-identical across the batch, test-pinned). r10 removes the
last O(corpus-doc-rows) reads: the pair-endpoint rep join reads ONLY
the buckets a pair endpoint hashes into (an endpoint's stored row —
and with it the cluster_id and the cluster-constant cluster_size — can
only live in its own pmod bucket), and affected-bucket discovery reads
the cluster→bucket side index (`cindex`: each bucket's distinct
cluster ids, maintained beside every bucket rewrite) instead of the
doc-granular assignment — cluster-granular rows, the band-key-store
economics. Pre-index stores (a data bucket whose newest committed
version has no cindex twin) fall back to the full-scan discovery.

Precondition (documented, asserted nowhere hot): doc_ids are unique
across the stream — the append-only ingest shape. Re-ingest
REPLACEMENT (same doc_id, new text) is batch-mode maintenance
(dedup_minhash_incremental's anti-join handles it there); a streaming
replacement would additionally need stored-pair retraction, which no
append-only log can express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CLUSTER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("cluster_id", T.LongType()),
        T.StructField("cluster_size", T.IntegerType()),
    ]
)
_DOC_SETS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("s", T.ArrayType(T.LongType())),
    ]
)
_BAND_KEYS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band_key", T.StringType()),
    ]
)


def _list_ids(spark: SparkSession, path: str, prefix: str) -> list[int]:
    """Numeric suffixes of `{prefix}={id}` subdirectories, via the JVM
    Hadoop FileSystem so the layout works on any cluster store, not
    just the local FS."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(prefix + "="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


class ClusterMaintenance:
    """foreachBatch processor maintaining the dedup index + cluster
    assignment under a document stream. Attach with::

        q = (stream.writeStream.foreachBatch(cm.process)
             .option("checkpointLocation", ckpt).start())

    and read the live assignment any time with ``cm.clusters(spark)``.
    Parity pin (tests/test_streaming.py): after streaming the corpus in
    micro-batches, clusters(spark) equals batch
    dedup_clusters(full corpus) row-for-row.
    """

    def __init__(self, state_dir: str, n_buckets: int = 8):
        self.state_dir = str(state_dir).rstrip("/")
        self.n_buckets = int(n_buckets)

    # -- state readers -------------------------------------------------
    def _read_prior(
        self, spark: SparkSession, sub: str, schema: T.StructType, before: int
    ) -> DataFrame:
        base = f"{self.state_dir}/{sub}"
        ids = [b for b in _list_ids(spark, base, "batch") if b < before]
        if not ids:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[f"{base}/batch={b}" for b in ids]
        )

    def _bucket_paths(
        self, spark: SparkSession, committed: int | None
    ) -> list[str]:
        """Per bucket, the path of its newest version ≤ the committed
        batch id (None → no committed state)."""
        if committed is None:
            return []
        base = f"{self.state_dir}/clusters"
        paths = []
        for k in range(self.n_buckets):
            vs = [
                v
                for v in _list_ids(spark, f"{base}/bucket={k}", "v")
                if v <= committed
            ]
            if vs:
                paths.append(f"{base}/bucket={k}/v={max(vs)}")
        return paths

    def _last_committed(
        self, spark: SparkSession, before: int | None
    ) -> int | None:
        ids = _list_ids(spark, f"{self.state_dir}/clusters/_commits", "batch")
        if before is not None:
            ids = [b for b in ids if b < before]
        return max(ids) if ids else None

    def _buckets_subset(
        self, spark: SparkSession, committed: int | None, buckets
    ) -> DataFrame:
        """The stored assignment restricted to the given hash buckets —
        the partition-pruned read behind the pair-endpoint rep join (an
        endpoint's stored row can only live in pmod(doc_id, n_buckets)
        of itself, so restricting the contracted solve's stored side to
        endpoint buckets is exact)."""
        paths = [
            p
            for p in self._bucket_paths(spark, committed)
            if int(p.rsplit("bucket=", 1)[1].split("/")[0]) in buckets
        ]
        if not paths:
            return spark.createDataFrame([], _CLUSTER_SCHEMA)
        return spark.read.schema(_CLUSTER_SCHEMA).parquet(*paths)

    def _cluster_index(
        self, spark: SparkSession, committed: int | None
    ) -> DataFrame | None:
        """Consistent snapshot of the cluster→bucket side index:
        per data bucket, its newest cindex version at or below the
        commit. Returns None when any committed data bucket lacks its
        cindex twin at the same version (a store written before the
        index existed) — callers then fall back to the full scan."""
        if committed is None:
            return spark.createDataFrame([], "bucket int, cluster_id long")
        base = f"{self.state_dir}/clusters"
        paths = []
        for p in self._bucket_paths(spark, committed):
            k = int(p.rsplit("bucket=", 1)[1].split("/")[0])
            v = int(p.rsplit("v=", 1)[1].rstrip("/"))
            ipath = f"{base}/cindex/bucket={k}/v={v}"
            if v not in _list_ids(spark, f"{base}/cindex/bucket={k}", "v"):
                return None
            paths.append(ipath)
        if not paths:
            return spark.createDataFrame([], "bucket int, cluster_id long")
        return spark.read.schema("bucket int, cluster_id long").parquet(
            *paths
        )

    def clusters(self, spark: SparkSession, before: int | None = None) -> DataFrame:
        """The stored assignment as of the latest COMMITTED batch (or
        the latest committed batch strictly below `before`, for replay
        reads): per bucket, its newest version at or below that commit —
        a consistent snapshot even while a batch is mid-write."""
        paths = self._bucket_paths(
            spark, self._last_committed(spark, before)
        )
        if not paths:
            return spark.createDataFrame([], _CLUSTER_SCHEMA)
        return spark.read.schema(_CLUSTER_SCHEMA).parquet(*paths)

    def pairs(self, spark: SparkSession) -> DataFrame:
        """All pairs emitted so far (union over batches)."""
        return self._read_prior(
            spark,
            "pairs",
            T.StructType(
                [
                    T.StructField("doc_a", T.LongType()),
                    T.StructField("doc_b", T.LongType()),
                    T.StructField("jaccard", T.DoubleType()),
                ]
            ),
            before=1 << 62,
        )

    # -- the batch body ------------------------------------------------
    def process(self, batch_docs: DataFrame, batch_id: int) -> None:
        from vedb_gaze_spark.operators.dedup import (
            _band_keys,
            _clusters_incremental_parts,
            _doc_sets,
            _minhash_signatures,
            apply_cluster_patch,
            dedup_minhash_incremental,
        )

        spark = batch_docs.sparkSession
        bid = int(batch_id)
        ds_dir = f"{self.state_dir}/doc_sets/batch={bid}"
        bk_dir = f"{self.state_dir}/band_keys/batch={bid}"
        pr_dir = f"{self.state_dir}/pairs/batch={bid}"
        cl_base = f"{self.state_dir}/clusters"

        # 1) extend the index: shingle the batch ONCE, store sets + keys
        _doc_sets(batch_docs).write.mode("overwrite").parquet(ds_dir)
        new_ds = spark.read.schema(_DOC_SETS_SCHEMA).parquet(ds_dir)
        _band_keys(_minhash_signatures(new_ds)).write.mode("overwrite").parquet(
            bk_dir
        )

        # 2) the batch's pairs, against stored sets + stored keys only
        index_ds = self._read_prior(spark, "doc_sets", _DOC_SETS_SCHEMA, bid)
        index_bk = self._read_prior(spark, "band_keys", _BAND_KEYS_SCHEMA, bid)
        dedup_minhash_incremental(
            index_ds, None, index_band_keys=index_bk, new_doc_sets=new_ds
        ).write.mode("overwrite").parquet(pr_dir)
        new_pairs = spark.read.parquet(pr_dir).select("doc_a", "doc_b")

        # 3) fold into the stored assignment: contracted-graph solve →
        # batch-sized patch tables → rewrite ONLY affected buckets
        committed = self._last_committed(spark, before=bid)
        bucket = F.pmod(F.col("doc_id"), F.lit(self.n_buckets)).cast("int")
        # pair-endpoint rep join against ONLY the endpoint buckets: the
        # stored row of any endpoint (with its cluster_id and the
        # cluster-constant cluster_size) lives in its own pmod bucket,
        # so the contracted solve never reads the rest of the corpus
        ep_buckets = {
            r[0]
            for r in new_pairs.select(
                F.explode(F.array("doc_a", "doc_b")).alias("d")
            )
            .select(
                F.pmod(F.col("d"), F.lit(self.n_buckets))
                .cast("int")
                .alias("b")
            )
            .distinct()
            .collect()
        }
        stored_ep = self._buckets_subset(spark, committed, ep_buckets)
        remap, sizes, new_out = _clusters_incremental_parts(
            stored_ep, new_pairs
        )
        # the patch tables feed one plan per affected bucket plus the
        # bucket-discovery scans; materialize them once (batch-sized)
        # instead of re-running the contracted solve per consumer
        from vedb_gaze_spark.functions.core import iter_checkpoint

        remap = iter_checkpoint(remap)
        sizes = iter_checkpoint(sizes)
        new_out = iter_checkpoint(new_out)
        # affected-bucket discovery: remapped clusters' members may sit
        # in ANY bucket — found via the cluster→bucket side index
        # (cluster-granular rows), never by scanning assignment rows;
        # full scan only for pre-index stores
        cindex = self._cluster_index(spark, committed)
        if cindex is not None:
            moved = {
                r[0]
                for r in cindex.join(F.broadcast(remap), "cluster_id")
                .select("bucket")
                .distinct()
                .collect()
            }
        else:  # pragma: no cover - legacy stores only
            moved = {
                r[0]
                for r in self.clusters(spark, before=bid)
                .join(F.broadcast(remap), "cluster_id")
                .select(bucket.alias("b"))
                .distinct()
                .collect()
            }
        touched = {
            r[0]
            for r in new_out.select(bucket.alias("b")).distinct().collect()
        } | moved
        for k in sorted(touched):
            prior_vs = [
                v
                for v in _list_ids(spark, f"{cl_base}/bucket={k}", "v")
                if committed is not None and v <= committed
            ]
            if prior_vs:
                bucket_stored = spark.read.schema(_CLUSTER_SCHEMA).parquet(
                    f"{cl_base}/bucket={k}/v={max(prior_vs)}"
                )
            else:
                bucket_stored = spark.createDataFrame([], _CLUSTER_SCHEMA)
            patched = apply_cluster_patch(bucket_stored, remap, sizes)
            out = patched.unionByName(new_out.where(bucket == k))
            out.write.mode("overwrite").parquet(f"{cl_base}/bucket={k}/v={bid}")
            # the bucket's side-index twin: its distinct cluster ids,
            # computed from the just-written bucket-sized files
            (
                spark.read.schema(_CLUSTER_SCHEMA)
                .parquet(f"{cl_base}/bucket={k}/v={bid}")
                .select(
                    F.lit(k).cast("int").alias("bucket"),
                    F.col("cluster_id"),
                )
                .distinct()
                .write.mode("overwrite")
                .parquet(f"{cl_base}/cindex/bucket={k}/v={bid}")
            )
        # 4) commit marker LAST: readers (and replays) only ever see
        # fully-written batches
        jvm = spark._jvm
        mpath = jvm.org.apache.hadoop.fs.Path(
            f"{cl_base}/_commits/batch={bid}"
        )
        fs = mpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.mkdirs(mpath)


def streaming_cluster_maintenance(
    stream_docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Wire a document stream into ClusterMaintenance; returns the
    started StreamingQuery plus the maintenance handle.
    ``available_now=True`` makes a catch-up run: process everything
    currently available, then terminate — the batch-parity shape the
    tests pin; the default is a continuously-running query."""
    cm = ClusterMaintenance(state_dir)
    w = stream_docs.writeStream.foreachBatch(cm.process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    q = w.start()
    return q, cm


# --- stored training order (epoch_shuffle's maintenance twin, r9) --------
#
# epoch_shuffle's output is the one assembly-family table that had no
# streaming/maintenance story (r8 verdict #7): the exact global rank of
# every doc under the per-epoch hash permutation. The rank is a GLOBAL
# property — a new document shifts the position of every doc hashed
# after it — so a row-local streaming scorer cannot exist for NEW docs.
# What CAN be maintained incrementally is exactly what the two-level
# rank decomposition exposes: shuffle_pos = bucket offset (256·epochs
# metadata rows) + rank within bucket. Appending a batch only re-ranks
# the buckets the batch's hashes land in (bucket-sized work, pruned
# partition reads/writes) and rewrites the metadata-sized offsets —
# never a corpus-wide shuffle. The 8-bit bucket width is the
# granularity knob: a batch touching all 256 buckets re-ranks the whole
# corpus (correct, just not cheap); more hash bits shrink the touched
# fraction for small nightly batches.


def _epoch_order_rows(documents: DataFrame, epochs: int) -> DataFrame:
    """(doc_id, epoch, h, bucket) under epoch_shuffle's exact keying —
    the ONE hash/bucket definition the batch operator and this store
    share (operators/corpus.py:epoch_shuffle)."""
    from vedb_gaze_spark.functions.core import portable_hash60

    e = documents.select("doc_id").crossJoin(
        F.broadcast(
            documents.sparkSession.range(epochs).select(
                F.col("id").cast("int").alias("epoch")
            )
        )
    )
    h = portable_hash60(
        F.concat(
            F.lit("shuf:"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    return e.select("doc_id", "epoch", h.alias("h")).withColumn(
        "bucket", F.shiftright("h", 52).cast("int")
    )


def _write_epoch_offsets(counts_rows, path: str, spark: SparkSession) -> None:
    """Offsets sidecar from per-(epoch, bucket) counts: cumulative
    doc count of LOWER buckets within the epoch. counts_rows is a
    metadata-sized list of Row(epoch, bucket, c). Crash-atomic via the
    same versioned promotion as the stats-layout manifest
    (sources/writers.py:versioned_dir): the new sidecar lands as
    offsets_v{N+1} with _SUCCESS last, so a reader resolves either the
    complete old or the complete new version — never a half-written
    overwrite."""
    from vedb_gaze_spark.sources.writers import (
        _manifest_version,
        gc_versioned_dirs,
        versioned_dir,
    )

    per = {}
    for r in counts_rows:
        per.setdefault(r["epoch"], {})[r["bucket"]] = r["c"]
    rows = []
    for ep, buckets in per.items():
        acc = 0
        for b in sorted(buckets):
            rows.append((ep, b, buckets[b], acc))
            acc += buckets[b]
    try:
        cur = versioned_dir(spark, path, "offsets")
        next_v = _manifest_version(cur, "offsets") + 1
    except FileNotFoundError:
        cur, next_v = "", 1
    spark.createDataFrame(
        rows, "epoch int, bucket int, c bigint, offset bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/offsets_v{next_v}")
    gc_versioned_dirs(
        spark, path, "offsets", keep_from=next_v - 1, protect=cur
    )


def _read_epoch_offsets(spark: SparkSession, path: str) -> DataFrame:
    from vedb_gaze_spark.sources.writers import versioned_dir

    return spark.read.parquet(versioned_dir(spark, path, "offsets"))


def write_epoch_order(
    documents: DataFrame, path: str, epochs: int = 2
) -> None:
    """Materialize the training-order table as an append-maintainable
    store: `{path}/order/epoch=E/bucket=B/` holds (doc_id, h, rn — the
    WITHIN-bucket rank) and `{path}/offsets` the 256·epochs cumulative
    bucket offsets. read_epoch_order reconstructs epoch_shuffle's exact
    shuffle_pos = offset + rn; append_epoch_order grows the store
    bucket-locally."""
    d = _epoch_order_rows(documents, epochs)
    from pyspark.sql import Window

    win = Window.partitionBy("epoch", "bucket").orderBy("h", "doc_id")
    (
        d.withColumn("rn", F.row_number().over(win).cast("long"))
        .write.mode("overwrite")
        .partitionBy("epoch", "bucket")
        .parquet(f"{path}/order")
    )
    spark = documents.sparkSession
    counts = (
        spark.read.parquet(f"{path}/order")
        .groupBy("epoch", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    _write_epoch_offsets(counts, path, spark)


def append_epoch_order(new_docs: DataFrame, path: str) -> None:
    """Grow the stored training order without re-ranking untouched
    buckets: the batch's hashes name the affected (epoch, bucket)
    partitions; ONLY those partitions are read back (parquet partition
    pruning), unioned with the batch's anti-joined-fresh rows
    (idempotent replay), re-ranked within bucket, and dynamically
    overwritten — files of untouched buckets stay byte-identical
    (pytest-pinned). Offsets rebuild UNCONDITIONALLY from the store's
    ACTUAL touched-partition counts (a partition-pruned scan of only
    the batch's buckets) merged with the stored counts of untouched
    buckets — so replaying a batch after a crash between the order
    overwrite and the offsets write HEALS the sidecar: the no-fresh-doc
    replay path still rebuilds instead of early-returning past it."""
    spark = new_docs.sparkSession
    offsets = _read_epoch_offsets(spark, path)
    epochs = offsets.agg(F.max("epoch")).collect()[0][0] + 1
    d = _epoch_order_rows(new_docs, epochs)
    existing = spark.read.parquet(f"{path}/order").select(
        "doc_id", "epoch", "h", "bucket"
    )
    # the batch's touched partitions BEFORE any store read: a doc's
    # buckets depend only on its own hash, so both the idempotency
    # anti-join and the re-rank read can restrict to them
    touched = [
        (r["epoch"], r["bucket"])
        for r in d.select("epoch", "bucket").distinct().collect()
    ]
    if not touched:
        return
    # literal partition predicate (OR of epoch=e AND bucket=b, ≤
    # 256·epochs terms): lands as a parquet PartitionFilter, so the
    # store read touches ONLY the affected partition dirs — a broadcast
    # join against a touched-list table would scan every partition and
    # filter after the fact (plan-pinned in tests)
    pred = None
    for ep, bk in touched:
        term = (F.col("epoch") == ep) & (F.col("bucket") == bk)
        pred = term if pred is None else (pred | term)
    affected_old = existing.where(pred)
    from vedb_gaze_spark.functions.core import iter_checkpoint

    fresh = iter_checkpoint(
        d.join(
            affected_old.select("doc_id").distinct(), "doc_id", "left_anti"
        ),
        eager=True,
    )  # batch-sized; evaluated once below
    if not fresh.rdd.isEmpty():
        from pyspark.sql import Window

        win = Window.partitionBy("epoch", "bucket").orderBy("h", "doc_id")
        (
            affected_old.unionByName(
                fresh.select("doc_id", "epoch", "h", "bucket")
            )
            .withColumn("rn", F.row_number().over(win).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch", "bucket")
            .parquet(f"{path}/order")
        )
    # offsets: the TOUCHED buckets' counts re-derived from the store
    # itself (same literal partition predicate — only the batch's
    # partition dirs are scanned), untouched buckets from the stored
    # sidecar. Unconditional: runs even when the anti-join found no
    # fresh docs, which is exactly the crashed-replay case where the
    # order rows were already overwritten but the sidecar was not.
    actual = {
        (r["epoch"], r["bucket"]): r["c"]
        for r in spark.read.parquet(f"{path}/order")
        .where(pred)
        .groupBy("epoch", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    merged = {
        (r["epoch"], r["bucket"]): r["c"] for r in offsets.collect()
    }
    merged.update(actual)
    from pyspark.sql import Row

    _write_epoch_offsets(
        [Row(epoch=k[0], bucket=k[1], c=c) for k, c in merged.items()],
        path,
        spark,
    )


def read_epoch_order(spark: SparkSession, path: str) -> DataFrame:
    """The stored table as epoch_shuffle's exact output: (epoch,
    doc_id, shuffle_pos). The offsets side is metadata — broadcast
    join, no shuffle of the order rows."""
    order = spark.read.parquet(f"{path}/order")
    offsets = _read_epoch_offsets(spark, path).select(
        "epoch", "bucket", "offset"
    )
    return order.join(F.broadcast(offsets), ["epoch", "bucket"]).select(
        "epoch",
        "doc_id",
        (F.col("offset") + F.col("rn")).cast("long").alias("shuffle_pos"),
    )
