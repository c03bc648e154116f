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


def write_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_queries: int = P.ANN_N_QUERIES,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 3,
    coarse_centroids: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    """IVFADC serving index (the ann_ivfpq layout, stored): residual PQ
    codes written PARTITIONED BY coarse cell — `codes/cell=N/` — so a
    serving batch that probes nprobe cells READS nprobe/n_cells of the
    index via plain parquet partition pruning (the physical realization
    of the inverted file; the same partition-keyed layout
    streaming/maintenance.py uses for bucket overwrite). Rerank vectors
    stored unpartitioned (fetched by id, candidate-sized reads).

    The index is SELF-DESCRIBING: its coarse quantizer (the trained
    Lloyd's centroids, or the P.IVF_CENTROIDS default) is persisted at
    `{path}/centroids` — residual codes are meaningless under any other
    quantizer, so the server must probe and decode with exactly the
    centroids the codes were written against (IVFPQServing reads them
    from the index, never from params)."""
    from vedb_gaze_spark.operators.similarity import (
        _ivfpq_encode_gen,
        _vecs,
        pq_train,
    )

    cents = [
        list(map(float, c))
        for c in (coarse_centroids
                  if coarse_centroids is not None else P.IVF_CENTROIDS)
    ]
    books = pq_train(
        embeddings, m=m, k_sub=k_sub, iters=iters, coarse_centroids=cents
    )
    v = _vecs(embeddings)
    corpus = v.where(F.col("vec_id") >= n_queries)
    corpus.mapInPandas(
        _ivfpq_encode_gen(books, cents),
        "neighbor_id bigint, cell int, codes array<int>",
    ).write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")
    corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
    ).write.mode("overwrite").parquet(f"{path}/vectors")
    spark = embeddings.sparkSession
    spark.createDataFrame(
        [(cents,)], "cents array<array<double>>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [([[list(map(float, c)) for c in book] for book in books],)],
        "books array<array<array<double>>>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    return books


def append_ivfpq_index(embeddings_new: DataFrame, path: str) -> None:
    """Grow a stored IVFADC index by a batch of NEW vectors WITHOUT
    rewriting it — the ANN-index twin of the gram index's
    append_gram_index (and the last step of the production index
    lifecycle: train → store → serve → GROW). New vectors are encoded
    with the index's OWN stored quantizer and codebooks (never
    retrained — residual codes must stay commensurable with the rows
    already in the index; periodic retraining is a REBUILD, by design),
    then appended under the same cell partitioning: only probed cells'
    directories gain files, every pre-existing file stays
    byte-identical, and the rerank vector store grows by the same rows.

    Idempotent by construction: an anti-join on neighbor_id against the
    stored codes drops vectors already indexed, so replaying a batch
    whose append committed adds nothing. ALL input rows are treated as
    corpus vectors — the caller owns query/corpus splits."""
    from vedb_gaze_spark.operators.similarity import (
        _ivfpq_encode_gen,
        _vecs,
    )

    spark = embeddings_new.sparkSession
    cents = [
        list(map(float, c))
        for c in spark.read.parquet(f"{path}/centroids").collect()[0]["cents"]
    ]
    books = [
        [list(map(float, c)) for c in book]
        for book in spark.read.parquet(f"{path}/codebooks").collect()[0][
            "books"
        ]
    ]
    existing = spark.read.parquet(f"{path}/codes").select("neighbor_id")
    fresh = (
        _vecs(embeddings_new)
        .select(F.col("vec_id"), F.col("v"))
        .join(
            existing.select(F.col("neighbor_id").alias("vec_id")),
            "vec_id",
            "left_anti",
        )
        .persist()
    )
    fresh.mapInPandas(
        _ivfpq_encode_gen(books, cents),
        "neighbor_id bigint, cell int, codes array<int>",
    ).write.mode("append").partitionBy("cell").parquet(f"{path}/codes")
    fresh.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
    ).write.mode("append").parquet(f"{path}/vectors")
    fresh.unpersist()


class IVFPQServing:
    """foreachBatch handler over the cell-partitioned IVFADC index:
    per micro-batch, coarse-probe the batch's queries (numpy over the
    bounded query set), push `cell IN (probed)` into the codes scan —
    partition pruning reads only the probed cells' files — and run the
    shared _ivfpq_search kernel. Same idempotent batch-id-versioned
    output contract as PQServing. The driver holds codebooks + the
    probed-cell id set (≤ n_cells ints) — model state, never rows."""

    def __init__(
        self,
        index_path: str,
        out_dir: str,
        books: list[list[list[float]]] | None = None,
        k: int = P.ANN_K,
        nprobe: int = P.IVF_PROBES,
        rerank_mult: int = 8,
    ) -> None:
        self.index_path = index_path
        self.out_dir = out_dir
        self.books = books  # None → load the index's stored codebooks
        self.k = k
        self.nprobe = nprobe
        self.rerank_mult = rerank_mult
        self._cents: list[list[float]] | None = None

    def _load_books(self, spark: SparkSession) -> list[list[list[float]]]:
        """The index's stored residual codebooks ({path}/codebooks,
        written by write_ivfpq_index) when none were handed in — model
        state (m·k_sub·d_sub floats), loaded once per job."""
        if self.books is None:
            row = spark.read.parquet(
                f"{self.index_path}/codebooks"
            ).collect()[0]
            self.books = [
                [list(map(float, c)) for c in book] for book in row["books"]
            ]
        return self.books

    def _load_cents(self, spark: SparkSession) -> list[list[float]]:
        """The index's OWN coarse quantizer (`{path}/centroids`,
        written by write_ivfpq_index) — residual codes only decode
        under the centroids they were encoded against. Falls back to
        the P.IVF_CENTROIDS literals for pre-r8 indexes that did not
        persist theirs (which were always written with the literals).
        Model state: n_cells·dim floats, loaded once per job."""
        if self._cents is None:
            from pyspark.errors import AnalysisException

            try:
                row = spark.read.parquet(
                    f"{self.index_path}/centroids"
                ).collect()[0]
                self._cents = [list(map(float, c)) for c in row["cents"]]
            except AnalysisException:
                self._cents = [list(map(float, c)) for c in P.IVF_CENTROIDS]
        return self._cents

    def probed_codes(
        self, spark: SparkSession, queries: DataFrame
    ) -> DataFrame:
        """The pruned codes scan for a query batch: collects the probed
        CELL IDS (≤ n_cells ints — partition metadata, not data) and
        filters the partition column, which parquet answers with file
        pruning, not a full scan."""
        from vedb_gaze_spark.operators.similarity import _ivf_probe

        cents = self._load_cents(spark)
        cells = sorted(
            {
                r["cell"]
                for r in _ivf_probe(queries, cents, self.nprobe)
                .select("cell")
                .distinct()
                .collect()
            }
        )
        codes = spark.read.parquet(f"{self.index_path}/codes")
        return codes.where(F.col("cell").isin([int(c) for c in cells]))

    def process(self, batch_queries: DataFrame, batch_id: int) -> None:
        from vedb_gaze_spark.operators.similarity import (
            _ivfpq_search,
            _vecs,
        )

        spark = batch_queries.sparkSession
        cents = self._load_cents(spark)
        queries = _vecs(batch_queries).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        codes = self.probed_codes(spark, queries)
        full = spark.read.parquet(f"{self.index_path}/vectors")
        out = _ivfpq_search(
            queries, codes, full, self._load_books(spark), cents,
            self.k, self.nprobe, self.rerank_mult,
        )
        out.write.mode("overwrite").parquet(f"{self.out_dir}/batch={batch_id}")

    def results(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(_OUT_SCHEMA).option(
            "recursiveFileLookup", "true"
        ).parquet(self.out_dir)


def write_sq8_index(
    embeddings: DataFrame, path: str, n_queries: int = P.ANN_N_QUERIES
) -> list[tuple[float, float]]:
    """Build and store the SQ8 serving index: per-dim (min, max) stats
    (the whole model — two order statistics per dimension) and the 8-bit
    codes. SELF-DESCRIBING like the IVFPQ index: `{path}/stats` holds
    the quantizer beside `{path}/codes`, so a server needs only the
    path. 4× smaller than the float32 vectors; no rerank store — SQ8
    answers are ADC scores (operators/similarity.py:ann_sq8)."""
    from vedb_gaze_spark.operators.similarity import sq8_encode, sq8_stats

    stats = sq8_stats(embeddings)
    spark = embeddings.sparkSession
    spark.createDataFrame(
        [([float(mn) for mn, _ in stats], [float(mx) for _, mx in stats])],
        "mn array<double>, mx array<double>",
    ).write.mode("overwrite").parquet(f"{path}/stats")
    (
        sq8_encode(embeddings, stats)
        .where(F.col("vec_id") >= n_queries)
        .select(F.col("vec_id").alias("neighbor_id"), "codes")
        .write.mode("overwrite")
        .parquet(f"{path}/codes")
    )
    return stats


class SQ8Serving:
    """foreachBatch handler: answer each micro-batch of query vectors
    from the stored SQ8 index via the shared _sq8_search kernel — the
    PQServing pattern at the SQL-oracled end of the compression family.

    Exactly-once: batch-id-keyed overwrite directories (the
    maintenance.py idempotency contract)."""

    def __init__(
        self, index_path: str, out_dir: str, k: int = P.ANN_K
    ) -> None:
        self.index_path = index_path
        self.out_dir = out_dir
        self.k = k
        self._stats: list[tuple[float, float]] | None = None

    def _load_stats(self, spark: SparkSession) -> list[tuple[float, float]]:
        """The index's own quantizer ({path}/stats — ONE row of model
        state: per-dim min/max), loaded once per job, never data rows."""
        if self._stats is None:
            row = spark.read.parquet(f"{self.index_path}/stats").collect()[0]
            self._stats = list(zip(map(float, row["mn"]), map(float, row["mx"])))
        return self._stats

    def process(self, batch_queries: DataFrame, batch_id: int) -> None:
        from vedb_gaze_spark.operators.similarity import _sq8_search, _vecs

        spark = batch_queries.sparkSession
        stats = self._load_stats(spark)
        queries = _vecs(batch_queries).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        codes = spark.read.parquet(f"{self.index_path}/codes")
        out = _sq8_search(queries, codes, stats, self.k)
        out.write.mode("overwrite").parquet(
            f"{self.out_dir}/batch={batch_id}"
        )

    def results(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(
            "query_id bigint, rank int, neighbor_id bigint, score_sq8 double"
        ).option("recursiveFileLookup", "true").parquet(self.out_dir)


def write_ivfsq8_index(
    embeddings: DataFrame,
    path: str,
    n_queries: int = P.ANN_N_QUERIES,
    cents: list[list[float]] | None = None,
    with_labels: bool = False,
) -> list[tuple[float, float]]:
    """IVF+SQ8 serving index: 8-bit codes PARTITIONED BY coarse cell
    (`codes/cell=N/` — the write_ivfpq_index layout at the SQL-green
    end of the family) with the SELF-DESCRIBING model beside them:
    `{path}/stats` (per-dim min/max) and `{path}/centroids` (the coarse
    quantizer the cells were assigned under).

    ``with_labels`` (r12): persist each vector's label beside its codes
    (`nlbl`) so hard-negative MINING can run cell-pruned over the
    stored index (mine_hard_negatives_ivfsq8's serving path) — the
    label gate then filters the scored stream without any join back to
    the raw corpus."""
    from vedb_gaze_spark.operators.similarity import (
        _dots_expr_for,
        sq8_encode,
        sq8_stats,
    )

    cents = [
        list(map(float, c))
        for c in (cents if cents is not None else P.IVF_CENTROIDS)
    ]
    stats = sq8_stats(embeddings)
    enc = sq8_encode(embeddings, stats).withColumn(
        "dots", F.expr(_dots_expr_for(cents, "v"))
    )
    if with_labels:
        lab = embeddings.select(
            F.col("vec_id").alias("_lid"),
            F.col("label").cast("int").alias("nlbl"),
        )
        enc = enc.join(lab, enc["vec_id"] == lab["_lid"]).drop("_lid")
    cell = (F.expr("array_position(dots, array_max(dots))") - 1).cast("int")
    (
        enc.where(F.col("vec_id") >= n_queries)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "codes",
            cell.alias("cell"),
            *(["nlbl"] if with_labels else []),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    spark = embeddings.sparkSession
    spark.createDataFrame(
        [([float(mn) for mn, _ in stats], [float(mx) for _, mx in stats])],
        "mn array<double>, mx array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    spark.createDataFrame(
        [(cents,)], "cents array<array<double>>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return stats


class IVFSQ8Serving:
    """foreachBatch handler over the cell-partitioned IVF+SQ8 index:
    per micro-batch, probe the queries with the ROUNDED dot ranking
    (the batch face's own probe — engine-stable ties), push `cell IN
    (probed)` into the codes scan (parquet partition pruning), and run
    the shared _ivf_sq8_search kernel. Batch-id-versioned idempotent
    output, like every server here."""

    def __init__(
        self,
        index_path: str,
        out_dir: str,
        k: int = P.ANN_K,
        nprobe: int = P.IVF_PROBES,
        mine_labels: bool = False,
    ) -> None:
        self.index_path = index_path
        self.out_dir = out_dir
        self.k = k
        self.nprobe = nprobe
        # r12: hard-negative MINING mode — requires an index written
        # with_labels=True; each query micro-batch carries its label,
        # the label-inequality gate rides the shared kernel's
        # pair_filter, and answers add (query_label, neighbor_label).
        self.mine_labels = mine_labels
        self._stats: list[tuple[float, float]] | None = None
        self._cents: list[list[float]] | None = None

    def _load_stats(self, spark: SparkSession) -> list[tuple[float, float]]:
        """The index's stored quantizer stats (ONE row of model state)."""
        if self._stats is None:
            row = spark.read.parquet(f"{self.index_path}/stats").collect()[0]
            self._stats = list(
                zip(map(float, row["mn"]), map(float, row["mx"]))
            )
        return self._stats

    def _load_cents(self, spark: SparkSession) -> list[list[float]]:
        """The index's OWN coarse quantizer (one row of model state)."""
        if self._cents is None:
            row = spark.read.parquet(
                f"{self.index_path}/centroids"
            ).collect()[0]
            self._cents = [list(map(float, c)) for c in row["cents"]]
        return self._cents

    def probed_codes(
        self, spark: SparkSession, probed: DataFrame
    ) -> DataFrame:
        """The pruned codes scan for an already-probed query batch:
        collects the probed CELL IDS (≤ n_cells ints — partition
        metadata, not data) and filters the partition column."""
        cells = sorted(
            {
                int(r["cell"])
                for r in probed.select("cell").distinct().collect()
            }
        )
        codes = spark.read.parquet(f"{self.index_path}/codes")
        return codes.where(F.col("cell").isin(cells))

    def process(self, batch_queries: DataFrame, batch_id: int) -> None:
        from vedb_gaze_spark.operators.similarity import (
            _ivf_sq8_probe,
            _ivf_sq8_search,
            _vecs,
        )

        spark = batch_queries.sparkSession
        if self.mine_labels:
            lab = batch_queries.select(
                F.col("vec_id").alias("_lid"),
                F.col("label").cast("int").alias("qlbl"),
            )
            v = _vecs(batch_queries)
            queries = (
                v.join(lab, v["vec_id"] == lab["_lid"])
                .drop("_lid")
                .select(
                    F.col("vec_id").alias("query_id"),
                    F.col("v").alias("qv"),
                    "qlbl",
                )
            )
        else:
            queries = _vecs(batch_queries).select(
                F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
            )
        probed = _ivf_sq8_probe(
            queries, self._load_cents(spark), self.nprobe
        )
        codes = self.probed_codes(spark, probed)
        if self.mine_labels:
            out = _ivf_sq8_search(
                probed,
                codes,
                self._load_stats(spark),
                self.k,
                pair_filter=F.col("nlbl") != F.col("qlbl"),
                extra=[("qlbl", "int"), ("nlbl", "int")],
            ).select(
                "query_id",
                "rank",
                "neighbor_id",
                "score_sq8",
                F.col("qlbl").alias("query_label"),
                F.col("nlbl").alias("neighbor_label"),
            )
        else:
            out = _ivf_sq8_search(
                probed, codes, self._load_stats(spark), self.k
            )
        out.write.mode("overwrite").parquet(
            f"{self.out_dir}/batch={batch_id}"
        )

    def results(self, spark: SparkSession) -> DataFrame:
        schema = (
            "query_id bigint, rank int, neighbor_id bigint, score_sq8 double"
        )
        if self.mine_labels:
            schema += ", query_label int, neighbor_label int"
        return spark.read.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(self.out_dir)


def append_ivfsq8_index(embeddings_new: DataFrame, path: str) -> None:
    """Grow a stored IVF+SQ8 index without rewriting it (the
    append_ivfpq_index contract at the SQL-green end): encode the new
    vectors with the index's OWN stored stats + centroids (codes are
    meaningless under any other quantizer), anti-join out already-
    indexed ids (idempotent replay), and APPEND under the same cell
    partitioning — pre-existing files byte-identical, served answers
    over the grown index ≡ the shared kernel over old ∪ new."""
    from vedb_gaze_spark.operators.similarity import (
        _dots_expr_for,
        _sq8_codes_expr,
        _vecs,
    )

    spark = embeddings_new.sparkSession
    srow = spark.read.parquet(f"{path}/stats").collect()[0]
    stats = list(zip(map(float, srow["mn"]), map(float, srow["mx"])))
    crow = spark.read.parquet(f"{path}/centroids").collect()[0]
    cents = [list(map(float, c)) for c in crow["cents"]]
    existing = spark.read.parquet(f"{path}/codes").select("neighbor_id")
    v = _vecs(embeddings_new)
    fresh = v.join(
        existing, v["vec_id"] == existing["neighbor_id"], "left_anti"
    )
    out = fresh.withColumn(
        "dots", F.expr(_dots_expr_for(cents, "v"))
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        _sq8_codes_expr(stats).alias("codes"),
        (F.expr("array_position(dots, array_max(dots))") - 1)
        .cast("int")
        .alias("cell"),
    )
    out.write.mode("append").partitionBy("cell").parquet(f"{path}/codes")


def write_label_centroids(embeddings: DataFrame, path: str) -> None:
    """Build and store the frozen per-label centroid model of the
    label_separation report (operators/similarity.py:label_centroids):
    `{path}/centroids` holds (label, cv, n_vecs) — labels-sized model
    state, the whole index. SELF-DESCRIBING like every stored index in
    this module: a scorer needs only the path."""
    from vedb_gaze_spark.operators.similarity import label_centroids

    label_centroids(embeddings).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


class LabelSeparationServing:
    """foreachBatch handler: score each embedding micro-batch against
    the FROZEN stored label centroids (r9 verdict #8 — the streaming
    twin of the label_separation report's member half): per vector,
    cosine to its own label's centroid, the best other label, and the
    margin. The centroids load once (labels-sized model state, never
    data rows) and compile into literal row-local expressions
    (score_label_margins) — a batch scores at scan speed with no join
    and no shuffle, the nb_lang_id frozen-model discipline.

    The REPORT half (per-label intra_mean_cos) is the quantized mean
    of these per-member rows — parity-pinned in tests/test_streaming.py
    against batch label_separation. The centroid-vs-centroid half
    (nn over centroids) is labels²-sized metadata: recompute it from
    the stored centroids whenever wanted; it needs no stream.

    Exactly-once: batch-id-keyed overwrite directories (the
    maintenance.py idempotency contract)."""

    def __init__(self, index_path: str, out_dir: str) -> None:
        self.index_path = index_path
        self.out_dir = out_dir
        self._cents: list[tuple[int, list[float]]] | None = None

    def _load(self, spark: SparkSession) -> list[tuple[int, list[float]]]:
        if self._cents is None:
            self._cents = [
                (int(r["label"]), [float(x) for x in r["cv"]])
                for r in spark.read.parquet(
                    f"{self.index_path}/centroids"
                ).collect()
            ]
        return self._cents

    def process(self, batch: DataFrame, batch_id: int) -> None:
        from vedb_gaze_spark.operators.similarity import score_label_margins

        cents = self._load(batch.sparkSession)
        score_label_margins(batch, cents).write.mode("overwrite").parquet(
            f"{self.out_dir}/batch={batch_id}"
        )

    def results(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(
            "vec_id bigint, label int, own_cos double, "
            "nn_label int, nn_cos double, margin double"
        ).option("recursiveFileLookup", "true").parquet(self.out_dir)
