"""Similarity search over embedding columns (SURVEY §2.G).

- ``dedup_embedding_cosine``: near-dup pairs above a cosine threshold.
- ``ann_cosine_topk``: brute-force top-k — the exact baseline. Scale
  path: queries are broadcast; similarity + per-partition top-k happen
  in one pass over the embedding table; the final global top-k merges
  k·partitions rows, never the full corpus.
- ``ann_lsh``: random-hyperplane LSH — sign-bit bucket per vector, probe
  only the query's bucket, exact rerank inside. The index-shaped plan at
  100 TB (bucket key is an equi-join shuffle key).

All ranking uses cosine ROUNDED to 6 decimals with vec_id tie-breaks, so
ordering is engine-independent (last-ulp float drift can't flip ranks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vedb_gaze_spark.functions.core import cosine_similarity
from vedb_gaze_spark.plans import params as P


def _vecs(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def dedup_embedding_cosine(embeddings: DataFrame) -> DataFrame:
    """Embedding-cosine near-dup pairs (a<b) above threshold. Brute-force
    pair join at test SF; the LSH bucketing of ann_lsh is the scale path
    for the same semantics."""
    a = _vecs(embeddings).select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = _vecs(embeddings).select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= P.COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", "cosine")
    )


def ann_cosine_topk(
    embeddings: DataFrame, k: int = P.ANN_K, n_queries: int = P.ANN_N_QUERIES
) -> DataFrame:
    """Brute-force cosine top-k: the first n_queries vectors probe the
    rest of the corpus. Query set is broadcast (tiny); one scan of the
    corpus computes all similarities; ranking is a per-query window."""
    v = _vecs(embeddings)
    queries = v.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    corpus = v.where(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
    )
    cos = F.round(cosine_similarity(F.col("qv"), F.col("nv")), 6)
    scored = corpus.crossJoin(F.broadcast(queries)).withColumn("cosine", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _bucket(v: Column) -> Column:
    """Sign-bit bucket from the fixed hyperplanes: bit p set iff
    dot(v, plane_p) > 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(P.LSH_PLANES):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_lsh(
    embeddings: DataFrame, k: int = 3, n_queries: int = P.ANN_N_QUERIES
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's hyperplane sign
    bucket; exact cosine rerank within the bucket. Recall trades off with
    bucket count (8 planes → 256 buckets); at scale, multi-probe or
    fewer planes widen candidates without changing the plan shape."""
    v = _vecs(embeddings).withColumn("bucket", _bucket(F.col("v")))
    queries = v.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    corpus = v.where(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), "bucket"
    )
    cos = F.round(cosine_similarity(F.col("qv"), F.col("nv")), 6)
    scored = corpus.join(F.broadcast(queries), "bucket").withColumn("cosine", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def vector_norm(embeddings: DataFrame) -> DataFrame:
    """L2 norm of each embedding — the vector twin of odometry.py:99's
    absolute_linear_velocity (np.linalg.norm over stream vectors)."""
    v = _vecs(embeddings)
    norm = F.sqrt(
        F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return v.select("vec_id", F.round(norm, 6).alias("l2_norm"))
