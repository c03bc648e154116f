"""Streaming twins of the corpus-composition family (SURVEY §2.I).

stratified_sample is a pure per-row hash filter, so the BATCH operator
composes over a stream unchanged — no twin needed, the parity test
streams it directly.

Decontamination is the interesting one: the benchmark n-gram set is
STATIC (an eval suite, megabytes) while the corpus streams past it.
The batch operator derives the benchmark from the same DataFrame; the
streaming twin takes the benchmark as a driver-broadcast frozenset and
tests each arriving document row-locally in an Arrow batch — stateless,
append-mode, the natural shape for a 100 TB ingest pipeline: no
stream-stream join, no watermarked aggregation, benchmark shipped once
per executor.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from vedb_gaze_spark.plans import params as P

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def bench_ngram_set(documents: DataFrame, n: int = P.DECONTAM_NGRAM,
                    bench_mod: int = P.DECONTAM_BENCH_MOD) -> frozenset:
    """Collect the benchmark slice's distinct word n-grams (the static,
    small side — an eval suite). Mirrors operators/corpus.decontaminate's
    benchmark branch exactly."""
    from pyspark.sql import functions as F

    rows = (
        documents.where(F.col("doc_id") % bench_mod == 0)
        .select("doc_id", "text")
        .collect()
    )
    out = set()
    for r in rows:
        if r["text"] is None:  # NULL text is admissible (JSONL ingest)
            continue
        toks = _TOKEN_RE.findall(r["text"].lower())
        for i in range(len(toks) - n + 1):
            out.add(" ".join(toks[i : i + n]))
    return frozenset(out)


def streaming_decontaminate(
    stream: DataFrame,
    bench: frozenset,
    n: int = P.DECONTAM_NGRAM,
    bench_mod: int = P.DECONTAM_BENCH_MOD,
) -> DataFrame:
    """Row-local contamination count per streamed training doc against
    the broadcast benchmark set; emits only contaminated docs, matching
    the batch operator's (doc_id, n_overlap) rows."""
    sc = stream.sparkSession.sparkContext
    bc = sc.broadcast(bench)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b = bc.value
        for pdf in batches:
            ids, counts = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if int(doc_id) % bench_mod == 0:
                    continue  # the benchmark slice itself never trains
                if text is None or not isinstance(text, str):
                    # NULL text yields no tokens — NOT the 'None' token
                    # str() would fabricate (bench_ngram_set skips nulls
                    # the same way; at n=1 the literal would count as a
                    # spurious overlap)
                    continue
                toks = _TOKEN_RE.findall(text.lower())
                grams = {
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                }
                hit = len(grams & b)
                if hit:
                    ids.append(int(doc_id))
                    counts.append(hit)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "n_overlap": pd.Series(counts, dtype="int64")})

    return stream.select("doc_id", "text").mapInPandas(
        fn, "doc_id long, n_overlap long"
    )
