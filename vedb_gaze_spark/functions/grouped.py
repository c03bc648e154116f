"""Batched per-key applyInPandas.

applyInPandas pays a fixed Python/Arrow cost per GROUP; with millions of
small per-user groups that overhead dwarfs the numeric work (measured
~18 ms/group → 27 s for 1500 trivial TPS fits at sf0.1). Grouping by a
SALT of the key instead — and looping over the real keys inside one
pandas call — amortizes that cost across ~n_buckets groups while keeping
the exact same per-key semantics and parallelism up to n_buckets tasks.

At cluster scale, size n_buckets ≳ 4× executor-core count.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 128


def apply_per_key(
    df: DataFrame,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Run fn once per distinct value of `key`, batched by key-hash salt."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = [fn(g) for _, g in pdf.groupby(key, sort=True)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame({f.split()[0]: [] for f in schema.split(",")})
        return pd.concat(outs, ignore_index=True)

    salted = df.withColumn("__salt", F.pmod(F.hash(key), F.lit(n_buckets)))
    # Explicit numPartitions repartition on the salt, NOT the bare
    # groupBy: the grouped map's ENSURE_REQUIREMENTS exchange is subject
    # to AQE partition COALESCING, which is byte-based — a per-user
    # point table is a few hundred KB, so AQE folds all buckets into ONE
    # partition and every numpy kernel runs sequentially on one core
    # (measured: error_surface_grid 6.4 s → 1.8 s at sf0.1 from this
    # line alone). The kernels' cost scales with GROUP COUNT, not bytes
    # — exactly the case byte-based coalescing mis-sizes. An explicit
    # numPartitions repartition is exempt from coalescing and satisfies
    # the groupBy's distribution (no second exchange appears).
    #
    # 4× partitions over salt values (ADVICE r14): hashing n_buckets
    # distinct salts into exactly n_buckets partitions leaves ~1/e of
    # the partitions empty by birthday collision and stacks 2+ salt
    # groups sequentially in others (effective parallelism ~63% of
    # n_buckets — guide §2.5's "20-100× more distinct keys than
    # partitions", seen from the partition side). Hash partitioning on
    # __salt at ANY partition count still satisfies the groupBy's
    # distribution and stays exempt from AQE coalescing; the extra
    # empty partitions are zero-row no-op tasks.
    salted = salted.repartition(4 * n_buckets, "__salt")
    return salted.groupBy("__salt").applyInPandas(run, schema=schema)
