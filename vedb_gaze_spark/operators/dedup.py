"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

SURVEY §2.G: the training-data-pipeline dedup family, built on the
portable 60-bit md5 hash (functions/core.py) so every stage is
oracle-checkable bit-for-bit against DuckDB.

Scale design:
- exact dedup: one groupBy on the content hash (uniform keys).
- n-gram Jaccard: pair generation is blocked BY SHARED SHINGLE (only
  docs sharing at least one shingle ever meet), then one groupBy on the
  pair key. At 100 TB add a document-frequency cap on shingles (drop
  shingles appearing in >X% of docs) — noted inline.
- MinHash+LSH: signatures are 16 per-doc min-aggregates (map-side
  partials); candidates come from band-bucket self-joins (bucket keys are
  uniform by construction); only candidates are verified exactly.
- SimHash: 60 per-bit sign sums in ONE aggregation pass per doc.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vedb_gaze_spark.functions.core import portable_hash60
from vedb_gaze_spark.operators.text import shingles
from vedb_gaze_spark.plans import params as P


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup by content hash: one surviving doc_id (the smallest)
    per distinct text, plus the group size."""
    return (
        documents.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def _shingle_sets(documents: DataFrame) -> DataFrame:
    return shingles(documents).select("doc_id", "sh").distinct()


def _verify_jaccard(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact Jaccard for the given candidate (doc_a < doc_b) pairs."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= P.JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_ngram_jaccard(documents: DataFrame) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs. Blocking: docs only pair
    through shared shingles, so the join fans out per-shingle rather than
    across the corpus. At 100 TB, cap shingle document-frequency first
    (a WHERE on a windowed count) to bound the hottest keys."""
    sh = _shingle_sets(documents)
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    pairs = (
        sa.join(sb, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(pairs, sh)


def _minhash_signatures(sh: DataFrame) -> DataFrame:
    h31 = portable_hash60("sh") % P.MINHASH_PRIME
    aggs = [
        F.min((F.lit(a) * h31 + F.lit(b)) % P.MINHASH_PRIME).alias(f"mh{i}")
        for i, (a, b) in enumerate(P.MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def dedup_minhash_lsh(documents: DataFrame) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified exactly.

    16 permutations → 4 bands × 4 rows; docs sharing any band bucket are
    candidates; candidates get an exact Jaccard pass. Identical output to
    dedup_ngram_jaccard when LSH recall is 1 at the threshold — by very
    different (index-shaped) physical plans.
    """
    sh = _shingle_sets(documents)
    sig = _minhash_signatures(sh)
    rows = P.MINHASH_PERMS // P.MINHASH_BANDS
    bands = None
    for b in range(P.MINHASH_BANDS):
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        one = sig.select(
            "doc_id", F.concat_ws("-", F.lit(str(b)), *cols).alias("band_key")
        )
        bands = one if bands is None else bands.unionByName(one)
    ba = bands.select(F.col("doc_id").alias("doc_a"), "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band_key")
    cand = (
        ba.join(bb, "band_key")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(cand, sh)


def dedup_simhash(documents: DataFrame) -> DataFrame:
    """SimHash document fingerprints: per token-occurrence hash, each of
    the 60 hash bits votes ±1; the sign vector packs back into a 60-bit
    signature. One explode + one aggregation; exact-signature groups are
    the dedup buckets (banding the signature handles near-misses at
    scale)."""
    toks = documents.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("tok"),
    ).withColumn("h", portable_hash60("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(P.SIMHASH_BITS)
    ]
    sums = toks.groupBy("doc_id").agg(*bit_sums)
    simhash = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long")),
        range(P.SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    return sums.select("doc_id", simhash.alias("simhash"))
