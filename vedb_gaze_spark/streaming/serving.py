"""ANN serving over a document/query stream — the foreachBatch
PQ-search job (the query-side complement of maintenance.py's
index-build job).

Production ANN serving holds a COMPRESSED index (PQ byte codes, 32×
smaller than the vectors) and answers arriving queries against it,
fetching full-precision vectors only for the few rerank candidates.
The streaming shape here is foreachBatch: per micro-batch of query
vectors, run the BATCH `_pq_search` kernel (operators/similarity.py —
shared verbatim with the `ann_pq` registry face) against the STORED
codes table, and write the answers to a batch-id-versioned directory.

Why foreachBatch and not applyInPandasWithState: per-query top-k is a
grouped sort over a static relation, not an evolving per-key state —
the natural unit is "this micro-batch of queries joined against the
stored index", which is exactly a batch plan. The codes table is read
from parquet per batch (partition-prunable, never collected to the
driver or broadcast by hand), so the index can be arbitrarily large
and sharded — the driver holds only the m·k_sub·d_sub codebook floats
(model state).

Exactly-once: output dirs are keyed by batch_id and written with
overwrite — a replayed micro-batch (crash between write and
checkpoint commit) rewrites the same directory with the same rows
(the maintenance.py idempotency contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vedb_gaze_spark.plans import params as P

_OUT_SCHEMA = (
    "query_id bigint, rank int, neighbor_id bigint, "
    "adc_score double, cosine double"
)


def write_pq_index(
    embeddings: DataFrame,
    path: str,
    n_queries: int = P.ANN_N_QUERIES,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 3,
) -> list[list[list[float]]]:
    """Build and store the serving index: train codebooks on the corpus
    (model state, returned to the caller) and persist the PQ codes and
    full-precision vectors as parquet — `codes/` is the compressed
    index the per-batch search scans; `vectors/` is the rerank store
    it fetches candidates from. One encode pass; serving never
    re-encodes."""
    from vedb_gaze_spark.operators.similarity import (
        _pq_encode_gen,
        _vecs,
        pq_train,
    )

    books = pq_train(embeddings, m=m, k_sub=k_sub, iters=iters)
    v = _vecs(embeddings)
    corpus = v.where(F.col("vec_id") >= n_queries)
    corpus.mapInPandas(
        _pq_encode_gen(books, "vec_id", "neighbor_id"),
        "neighbor_id bigint, codes array<int>",
    ).write.mode("overwrite").parquet(f"{path}/codes")
    corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
    ).write.mode("overwrite").parquet(f"{path}/vectors")
    return books


class PQServing:
    """foreachBatch handler: answer each micro-batch of query vectors
    from the stored PQ index via the shared batch kernel.

    Usage::

        job = PQServing(index_path, out_dir, books)
        (query_stream.writeStream.foreachBatch(job.process)
         .trigger(availableNow=True).start())

    `query_stream` rows: (vec_id, embedding). Answers accumulate under
    ``{out_dir}/batch={id}/`` and read back via :meth:`results`.
    """

    def __init__(
        self,
        index_path: str,
        out_dir: str,
        books: list[list[list[float]]],
        k: int = P.ANN_K,
        rerank_mult: int = 8,
    ) -> None:
        self.index_path = index_path
        self.out_dir = out_dir
        self.books = books
        self.k = k
        self.rerank_mult = rerank_mult

    def process(self, batch_queries: DataFrame, batch_id: int) -> None:
        from vedb_gaze_spark.operators.similarity import _pq_search, _vecs

        spark = batch_queries.sparkSession
        queries = _vecs(batch_queries).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        codes = spark.read.parquet(f"{self.index_path}/codes")
        full = spark.read.parquet(f"{self.index_path}/vectors")
        out = _pq_search(
            queries, codes, full, self.books, self.k, self.rerank_mult
        )
        out.write.mode("overwrite").parquet(
            f"{self.out_dir}/batch={batch_id}"
        )

    def results(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(_OUT_SCHEMA).option(
            "recursiveFileLookup", "true"
        ).parquet(self.out_dir)
