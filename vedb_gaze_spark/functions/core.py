"""Reusable Column expressions.

Everything here is JVM-side (whole-stage-codegen friendly) and has an exact
DuckDB twin so the driver's value-hash oracle matches bit-for-bit:

- ``portable_hash60``: first 15 hex chars of md5 as a 60-bit BIGINT. Spark's
  xxhash64 and DuckDB's hash() disagree, md5 is identical everywhere.
- ``cents``: exact integer money arithmetic. Summing doubles is
  order-dependent (different partitionings → different last ulps), summing
  BIGINTs is exact and order-independent, so aggregates hash identically on
  any engine at any parallelism.
- ``tsec``: timestamps → epoch seconds as double via integer micros, the
  shared clock for every temporal operator (reference keeps float seconds,
  utils.py:67).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(col: Column | str) -> Column:
    """60-bit integer hash of a string, identical in Spark and DuckDB.

    Spark:  conv(substring(md5(s), 1, 15), 16, 10)::bigint
    DuckDB: ('0x' || substring(md5(s), 1, 15))::bigint
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def cents(col: Column | str, scale: int = 100) -> Column:
    """Money as exact integer (default: cents).

    floor(x*scale + 0.5) instead of round(): Spark's round() on doubles
    allocates a BigDecimal per row and knocked Q1 from ~1 s to ~20 s at
    sf0.1; floor is codegen-friendly and identical for non-negative inputs
    that are within ±ε of a grid point (all money columns here).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(scale) + F.lit(0.5))


def tsec(col: Column | str = "ts") -> Column:
    """Timestamp → epoch seconds (double) via exact integer microseconds."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.unix_micros(c) / F.lit(1000000.0)).alias("tsec")


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side.

    Sequential left-to-right aggregation — the same evaluation order DuckDB's
    list_cosine_similarity uses, keeping cross-engine drift to the last ulp.
    """
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)



def iter_checkpoint(df, eager: bool = True):
    """Lineage truncation for ITERATIVE spines (PageRank/HITS rounds,
    BPE merges, Lloyd's assignments, CC label propagation, multi-use
    pair tables): RELIABLE df.checkpoint when the session has a
    checkpoint dir configured (sparkContext.setCheckpointDir — blocks
    live in fault-tolerant storage, so an executor loss mid-iteration
    replays from the checkpoint instead of the unbounded lineage), and
    localCheckpoint otherwise — the right default for local mode, where
    executor loss cannot happen and storage round-trips would only
    slow the loop. Cluster deployments opt in with ONE session-level
    call; no operator parameter threading needed (SURVEY §4)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager)
    return df.localCheckpoint(eager)
