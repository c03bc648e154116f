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


def dsir_lr_table(documents: DataFrame) -> tuple[dict, int]:
    """Freeze dsir_select's per-bucket log-ratio table for streaming
    use: (bucket → micro-nat log ratio, default for unseen buckets).
    The table is FIXED-SIZE (≤ DSIR_BUCKETS rows) — collecting it is
    collecting a model, not a corpus (same standing as the decontam
    benchmark set), and broadcasting it row-locally is scale-correct
    at any corpus size. The default is the tc=rc=0 Laplace cell —
    principled for buckets the training corpus never hit (possible
    only for docs streamed AFTER the freeze)."""
    import math

    from vedb_gaze_spark.operators.corpus import _dsir_counts, _dsir_grams

    counts = _dsir_counts(
        _dsir_grams(documents, P.DSIR_BUCKETS, P.DECONTAM_BENCH_MOD)
    ).collect()
    T = sum(r["tc"] for r in counts)
    R = sum(r["rc"] for r in counts)
    B = P.DSIR_BUCKETS

    def q(tc, rc):
        return int(
            math.floor(
                (math.log((tc + 1.0) / (T + B)) - math.log((rc + 1.0) / (R + B)))
                * 1e6
                + 0.5
            )
        )

    return {r["b"]: q(r["tc"], r["rc"]) for r in counts}, q(0, 0)


def streaming_dsir_score(
    stream: DataFrame,
    lr: dict,
    default_lr: int,
    n_buckets: int = P.DSIR_BUCKETS,
    bench_mod: int = P.DECONTAM_BENCH_MOD,
) -> DataFrame:
    """Stateless streaming DSIR scorer: each arriving raw doc gets its
    integer micro-nat log importance weight against the FROZEN bucket
    table — row-local, no shuffle, no state, the decontamination shape
    (model broadcast once per executor, corpus streams past). Emits
    the exact rows batch dsir_scores emits for the same docs
    (integer-sum determinism makes the parity bit-exact); target-slice
    docs and gramless docs emit nothing, matching the batch inner
    join."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_s, out_n = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None or doc_id % bench_mod == 0:
                    continue
                toks = _TOKEN_RE.findall(str(text).lower())
                grams = toks + [
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                ]
                if not grams:
                    continue
                s = 0
                for g in grams:
                    h = int(
                        hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16
                    )
                    s += lr.get(h % n_buckets, default_lr)
                out_id.append(doc_id)
                out_s.append(s)
                out_n.append(len(grams))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "logw_unats": pd.Series(out_s, dtype="int64"),
                    "n_grams": pd.Series(out_n, dtype="int64"),
                }
            )

    return stream.select("doc_id", "text").mapInPandas(
        fn, "doc_id long, logw_unats long, n_grams long"
    )
