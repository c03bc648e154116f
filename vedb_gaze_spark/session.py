"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
builder applies (master comes from spark-submit). Defaults chosen for the
100 TB target: AQE on (runtime coalesce + skew-join split), Arrow for every
pandas exchange, and shuffle partitions sized by the environment rather
than hardcoded in operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vedb-gaze-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the generated-class cache defaults to 100 entries; a session
        # running the full registry (60+ queries x several codegen stages
        # each) thrashes it, so later queries re-compile every stage and
        # compute-dense plans run on cold, un-JITed classes (measured:
        # the same query 3.4 s early in a 24-query session, 31 s late).
        # r9: 2000 → 5000 — the headline queue reached 113 queries and
        # the widest plan (dedup_agreement, three near-dup kernels in
        # one union job) measured 52 s at queue position 101 vs 11-20 s
        # isolated: the r6 eviction signature again, one size up.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # local mode runs executors inside the driver JVM: size the heap
        # for all $SPARK_GRAFT_CPUS task threads, not a lone driver
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # JIT CodeCache headroom: measured 112 MB of compiled nmethods
        # after only 40 small-SF registry queries (r9 probe), so the
        # full 113-query sf0.1 session plausibly crosses the 240 MB
        # default — at which point UseCodeCacheFlushing DISCARDS hot
        # compiled methods and compute-dense late-queue plans re-run
        # interpreted (the layer below PERF_NOTES' generated-class
        # cache thrash). 512 MB removes that failure mode; it is NOT
        # the whole in-session variance story for the widest plans
        # (dedup_agreement re-JITs its union job per session — see
        # PERF_NOTES r9).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .config("spark.ui.enabled", "false")
        # With SPARK_GRAFT_CHECKPOINT_DIR set, every iterative spine
        # switches to reliable df.checkpoint (BPE every 6 merges, HITS
        # twice per iteration, CC per round — iter_checkpoint), and
        # Spark never deletes reliable checkpoint data unless the
        # ContextCleaner is told to — unbounded checkpoint-dir growth
        # across jobs on cluster deployments (ADVICE r10). Static conf,
        # so it must be on the builder, not a live session; harmless in
        # local mode where localCheckpoint is used instead.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    if not os.environ.get("SPARK_MASTER_OVERRIDE_DISABLED"):
        # In tests / local runs there is no cluster manager; on a real
        # cluster spark-submit's --master wins because getOrCreate reuses
        # the existing session.
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    # Cluster deployments set SPARK_GRAFT_CHECKPOINT_DIR to a
    # fault-tolerant path and every iterative spine switches from
    # localCheckpoint to reliable df.checkpoint through
    # functions/core.py:iter_checkpoint — the one session-level opt-in
    # (SURVEY §4). Local mode leaves it unset: nothing to survive.
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt and spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
