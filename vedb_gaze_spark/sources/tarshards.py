"""WebDataset-style tar shards (SURVEY §2.G multimodal sources).

The standard layout for image/audio/video training corpora is a set of
tar files ("shards"), each holding many small members keyed by sample
id (WebDataset's convention: `{key}.{ext}`) — sequential reads at disk
bandwidth, no small-file metadata storm, shard = unit of parallelism.

Spark-first mapping, stdlib-only (no webdataset package):

- write: shard assignment is a pure column expression
  (doc_id-range → shard id), one applyInPandas group per shard builds
  the tar IN MEMORY with deterministic metadata (sorted members,
  zeroed mtimes — byte-reproducible output) and writes it directly to
  the shard path from the executor; the driver never sees payloads.
- read: `spark.read.format("binaryFile")` lists the shards (one row
  per tar — Spark's native whole-file source, splits = files), and an
  Arrow-batched mapInPandas unpacks members back into rows.

Round-trip is lossless and order-independent (test-pinned). With a
real image corpus the member bytes are the encoded frames and the
decode step is multimodal.decode_frames; here text payloads stand in,
exactly like the rest of the multimodal family."""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_tar_shards(
    documents: DataFrame, path: str, docs_per_shard: int = 200
) -> str:
    """Pack (doc_id, text) rows into `{path}/shard-{id:06d}.tar`, each
    member named `{doc_id}.txt`. Deterministic bytes: members sorted by
    doc_id, mtime/uid/gid zeroed.

    Filesystem contract: shards are written from EXECUTORS via plain
    ``open()``, so ``path`` must be a filesystem shared by all executors
    and the driver (NFS/FUSE-mounted object store/local mode). On a
    cluster with only executor-local disks, write to a Hadoop-visible
    path via the FileSystem API instead (see sources/writers.py —
    compact_table — and streaming/maintenance.py for that pattern);
    tar packing itself is unchanged either way."""
    os.makedirs(path, exist_ok=True)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard_id = int(pdf["shard"].iloc[0])
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = (text or "").encode("utf-8")
                info = tarfile.TarInfo(name=f"{int(doc_id)}.txt")
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))
        out = os.path.join(path, f"shard-{shard_id:06d}.tar")
        with open(out, "wb") as fh:
            fh.write(buf.getvalue())
        return pd.DataFrame(
            {"shard": [shard_id], "n_docs": [len(pdf)],
             "n_bytes": [buf.getbuffer().nbytes]}
        )

    stats = (
        documents.select("doc_id", "text")
        .withColumn("shard", (F.col("doc_id") / docs_per_shard).cast("long"))
        .groupBy("shard")
        .applyInPandas(pack, "shard long, n_docs long, n_bytes long")
    )
    stats.collect()  # materialize the writes (stats is shard-count-sized)
    return path


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Unpack `{path}/*.tar` back into (doc_id, text) rows. One
    binaryFile row per shard; unpacking is Arrow-batched and
    partition-parallel across shards."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts = [], []
            for content in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        ids.append(int(m.name.rsplit(".", 1)[0]))
                        texts.append(
                            tf.extractfile(m).read().decode("utf-8")
                        )
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "text": pd.Series(texts, dtype="object")}
            )

    shards = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    )
    return shards.select("content").mapInPandas(
        unpack, "doc_id long, text string"
    )
