"""Multimodal (binary) column plumbing — SURVEY §2.G.

The reference's frame-level detectors (pupil_detection_pl.py:11
``plabs_detect_pupil``, marker_detection.py:50 ``find_concentric_circles``)
consume video frames through OpenCV/pytorch. Neither library ships in this
container, so the pixel math is STUBBED — but the Spark side is real:
binary payload columns with typed metadata, Arrow-batched ``mapInPandas``
with a bounded batch size, and a deterministic fake "decode" so the
pipeline shape (schema, batching, partitioning) is testable end-to-end.

At scale the payload column stays in parquet as binary; decode runs
embarrassingly parallel with NO shuffle (mapInPandas preserves
partitioning), and column pruning keeps payload bytes out of any query
that only touches metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vedb_gaze_spark.functions.core import portable_hash60
from vedb_gaze_spark.plans import params as P

def multimodal_meta(documents: DataFrame) -> DataFrame:
    """Typed metadata over an opaque binary payload (text bytes stand in
    for image bytes): size, content hash, and decoded-shape fields derived
    from the hash — all JVM-side, payload never leaves the scan."""
    d = documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        portable_hash60("text").alias("h"),
    )
    return d.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        (F.col("h") % 1024 + 16).alias("width"),
        (F.shiftright("h", 10) % 1024 + 16).alias("height"),
        (F.col("h") % 3 + 1).alias("channels"),
    )


_DECODE_SCHEMA = "doc_id bigint, n_bytes int, mean_byte double, n_frames int"


def decode_frames(
    documents: DataFrame,
    batch_size: int = 64,
    real_decode: bool = False,
) -> DataFrame:
    """Arrow-batched decode over binary payloads via mapInPandas.

    The default face is the DETERMINISTIC byte-statistics decode — the
    oracle-able contract the registered `multimodal_decode` query pins,
    and it is import-environment invariant: installing cv2 does not
    change its rows (pytest-pinned). Real codec decode (cv2.imdecode /
    frame extraction — reference: marker_detection.py:29
    _find_circles_frame reads frames one by one in a Python loop; here
    frames would stream through executors in columnar Arrow batches) is
    an explicit opt-in via real_decode=True and is the one named
    unvendorable stub of this module: it raises NotImplementedError
    when REQUESTED, never from an import probe.
    """
    if real_decode:
        raise NotImplementedError(
            "real codec decode requires cv2/imageio (not vendored); "
            "the deterministic byte-statistics face is the default"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = np.empty(len(payload), dtype=np.int64)
            mean_byte = np.zeros(len(payload))
            for i, b in enumerate(payload):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n_bytes[i] = arr.size
                if arr.size:
                    # integer byte sums are exact in float64, so mean_byte
                    # is the same double in every engine; HALF_UP rounding
                    # (floor(x*1e6+0.5)/1e6) keeps it oracle-identical
                    mean_byte[i] = arr.mean()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "mean_byte": np.floor(mean_byte * 1e6 + 0.5) / 1e6,
                    "n_frames": (n_bytes % 7 + 1).astype("int32"),
                }
            )

    d = documents.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return d.mapInPandas(run, schema=_DECODE_SCHEMA)


def sample_frames(documents: DataFrame, stride: int = 3) -> DataFrame:
    """Deterministic frame sampling: every stride-th frame index of each
    payload's frame count (reference: pupil_detection_pl.py processes
    start_frame..end_frame ranges). Pure JVM explode(sequence()) — the
    flat-map shape a video pipeline uses to go clip → frame rows, with
    NO Python involvement and no shuffle; downstream per-frame decode
    joins on (doc_id, frame_idx)."""
    d = documents.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    ).select(
        "doc_id",
        (F.octet_length("payload") % 7 + 1).alias("n_frames"),
    )
    return d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
        ).alias("frame_idx"),
    )


_FEATURE_SCHEMA = "doc_id bigint, bin_idx int, weight double"


def extract_features(documents: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: a 16-bin
    L1-normalized byte histogram per payload — the stub for an image
    embedding model (the reference's pupil network, pupil_detection_pl.py
    :11, consumes frames the same way: batch in, fixed-dim vector out).

    Output is EXPLODED to (doc_id, bin_idx, weight) rows — one row per
    histogram bin — rather than an array column: hashable for any
    canonicalizer, SQL-oracle-able (the nibble histogram is expressible
    over hex(payload) in DuckDB), and the shape a feature store actually
    joins on. Weights use floor(x*1e6+0.5)/1e6 (HALF_UP for non-negative
    x) so both engines round identically. Deterministic, so tests can
    assert stability; swap the histogram for a real model call without
    touching the plan (mapInPandas preserves partitioning; batches bound
    executor memory)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        nb = P.FEATURE_BINS
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            W = np.zeros((len(ids), nb))
            for i, b in enumerate(pdf["payload"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size:
                    hist = np.bincount(arr >> 4, minlength=nb)
                    W[i] = np.floor(hist / arr.size * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(ids, nb),
                    "bin_idx": np.tile(np.arange(nb, dtype=np.int32), len(ids)),
                    "weight": W.ravel(),
                }
            )

    d = documents.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return d.mapInPandas(run, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = "doc_id bigint, thumb_md5 string, mean_px double, n_src_bytes int"


def resize_thumbnail(documents: DataFrame, target: int = 16) -> DataFrame:
    """Arrow-batched 'resize' over binary payloads: evenly-spaced byte
    subsampling to a fixed-length thumbnail (position i reads source
    byte floor(i·n/target)) — the nearest-neighbor downsample a real
    image resize reduces to on a 1-D payload, with cv2.resize slotting
    into the same batch loop when present. Emits the thumbnail's md5 and
    mean pixel value, so the output is SQL-oracle-able (character codes
    over the same positions in DuckDB) while exercising the exact
    mapInPandas batching/schema path a production resize uses. Integer
    byte sums are exact in float64 → mean_px is engine-identical under
    HALF_UP rounding."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            md5s = np.empty(len(ids), dtype=object)
            means = np.zeros(len(ids))
            sizes = np.zeros(len(ids), dtype=np.int32)
            keep = np.ones(len(ids), dtype=bool)
            for i, b in enumerate(pdf["payload"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n = arr.size
                sizes[i] = n
                if n == 0:
                    keep[i] = False
                    continue
                pos = (np.arange(target) * n) // target
                thumb = arr[pos]
                md5s[i] = hashlib.md5(thumb.tobytes()).hexdigest()
                means[i] = np.floor(thumb.mean() * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(
                {
                    "doc_id": ids[keep],
                    "thumb_md5": md5s[keep],
                    "mean_px": means[keep],
                    "n_src_bytes": sizes[keep],
                }
            )

    d = documents.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return d.mapInPandas(run, schema=_RESIZE_SCHEMA)


def phash_frame(documents: DataFrame, bits: int = P.PHASH_BITS) -> DataFrame:
    """(doc_id, ph): the dHash over each payload's ``bits``
    evenly-spaced byte samples — one shared JVM expression for the
    batch operator, the streaming twin, and (mirrored literally) the
    DuckDB oracle. Ring comparison: bit i set iff sample i > sample
    (i+1) mod bits.

    Deliberately an UNROLLED sum of if() terms, not
    transform+aggregate lambdas: higher-order functions evaluate
    interpreted (outside whole-stage codegen), and projection collapse
    inlines the hash into every consumer of `ph` — measured sf0.1, the
    HOF form cost 8.3 s for the full dedup vs 1.1 s unrolled, with
    identical values."""
    n = F.octet_length(F.col("text").cast("binary"))

    def samp(pos: str) -> str:
        return (
            f"ascii(substring(text, cast(({pos}) * length(text)"
            f" div {bits} as int) + 1, 1))"
        )

    terms = " + ".join(
        f"if({samp(str(i))} > {samp(str((i + 1) % bits))}, {1 << i}L, 0L)"
        for i in range(bits)
    )
    return documents.where(F.col("text").isNotNull() & (n > 0)).select(
        "doc_id", F.expr(terms).alias("ph")
    )


def phash_band_array(bands: int, rows_per_band: int):
    """Array of (band, key) structs slicing `ph` into banded keys."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("ph", b * rows_per_band)
                .bitwiseAND((1 << rows_per_band) - 1)
                .alias("key"),
            )
            for b in range(bands)
        ]
    )


def multimodal_phash_dedup(
    documents: DataFrame,
    bits: int = P.PHASH_BITS,
    bands: int = P.PHASH_BANDS,
    max_hamming: int = P.PHASH_MAX_HAMMING,
) -> DataFrame:
    """Perceptual-hash near-duplicate detection over media payloads —
    the image-dedup stage of a multimodal training pipeline (same
    banded-LSH shape as dedup_simhash, over pixels instead of words).

    dHash over the decode stub: the payload's ``bits`` evenly-spaced
    byte samples (exactly the resize stub's thumbnail positions,
    (i·n)//bits) compared pairwise around the ring — bit i set iff
    sample i > sample (i+1) mod bits. With a real codec the samples
    would be downscaled luma pixels; the hash algebra, banding, and
    verify are the production path and are what this operator pins.

    Candidates share a band PAIR: r flipped bits damage at most r of
    the ``bands`` bands, so two hashes within Hamming r ≤ bands − 2
    agree on at least two intact bands — some band pair collides, and
    recall is EXACT by pigeonhole (multi-index Hamming search,
    Norouzi et al. 2012). Pair keys are twice as wide as single-band
    keys, so bucket occupancy — and the Σ m² candidate volume — drops
    quadratically (measured sf0.1: 4.38 M single-band candidates →
    292 k band-pair candidates, join 7.3 s → sub-second). The exact
    Hamming distance then decides at radius ``max_hamming``;
    verification is an xor and a popcount per candidate — pure
    codegen — and the filter runs BEFORE the dedup-distinct so only
    true pairs shuffle.

    At 100 TB: band keys are near-uniform for non-duplicate content,
    every stage is groupBy/join on short uniform keys, nothing is
    broadcast, and the pair volume is the standard LSH candidate cost
    (Σ_buckets m² over bucket occupancies)."""
    return phash_dedup_pairs(
        phash_frame(documents, bits), bits, bands, max_hamming
    )


def phash_dedup_pairs(
    hashed: DataFrame,
    bits: int = P.PHASH_BITS,
    bands: int = P.PHASH_BANDS,
    max_hamming: int = P.PHASH_MAX_HAMMING,
) -> DataFrame:
    """The banded multi-index Hamming join over any (doc_id, ph) frame —
    shared by the byte-sample stub (multimodal_phash_dedup), the REAL
    pixel path (image_phash_dedup), and usable on any stored hash table;
    semantics and scale shape documented on multimodal_phash_dedup."""
    if max_hamming > bands - 2:
        raise ValueError(
            "band-pair candidates are exact only for "
            f"max_hamming <= bands - 2 (= {bands - 2}); got {max_hamming}"
        )
    rows_per_band = bits // bands
    mask = (1 << rows_per_band) - 1
    pair_arr = F.array(
        *[
            F.struct(
                F.lit(b1 * bands + b2).alias("band"),
                (
                    F.shiftright("ph", b1 * rows_per_band).bitwiseAND(mask)
                    * (mask + 1)
                    + F.shiftright("ph", b2 * rows_per_band).bitwiseAND(mask)
                ).alias("key"),
            )
            for b1 in range(bands)
            for b2 in range(b1 + 1, bands)
        ]
    )
    # ONE explicit (band, key) repartition feeds BOTH self-join sides:
    # the second side resolves to a ReusedExchange (the corpus is
    # scanned and hashed once, not once per side), the pre-satisfied
    # distribution means the join adds no further exchange, and the
    # shuffle_hash hint skips the sort a merge join would pay on keys
    # this short (the hint picks a strategy, it broadcasts nothing —
    # scale-safe). Hot buckets sit on single tasks by construction;
    # AQE skew-split covers shuffled-hash joins when a bucket outgrows
    # a task at real scale.
    n_part = int(
        hashed.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    keyed = (
        hashed.select("doc_id", "ph", F.explode(pair_arr).alias("bk"))
        .select("doc_id", "ph", "bk.band", "bk.key")
        .repartition(n_part, "band", "key")
    )
    cand = (
        keyed.select(
            F.col("doc_id").alias("doc_a"), F.col("ph").alias("ph_a"),
            "band", "key",
        )
        .join(
            keyed.select(
                F.col("doc_id").alias("doc_b"), F.col("ph").alias("ph_b"),
                "band", "key",
            ).hint("shuffle_hash"),
            ["band", "key"],
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming",
            F.expr("bit_count(ph_a ^ ph_b)").cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )
    return cand


# --- REAL pixel path: binary PNM (P5/P6) in pure numpy --------------------
# The one uncompressed format this container can decode without cv2:
# netpbm binary graymaps/pixmaps. The reference's frame loop
# (pupil_detection_pl.py:134, marker_detection.py:380) reads decoded
# frames exactly like this — here the decode itself is real, so
# decode → luma → resize → dHash → banded dedup runs end-to-end on
# actual pixels (planted-image tests), while compressed formats keep
# the stubbed path above until a codec is available.


def _parse_pnm_header(buf: bytes):
    """(magic, width, height, maxval, data_offset) for binary P5/P6, or
    None if the payload is not a well-formed 8-bit PNM. Pure-python
    header scan: fields separated by whitespace, '#' comments allowed,
    exactly one whitespace byte after maxval (per the netpbm spec)."""
    buf = bytes(buf)
    if len(buf) < 2 or buf[0:1] != b"P" or buf[1:2] not in (b"5", b"6"):
        return None
    fields: list[int] = []
    i = 2
    while len(fields) < 3 and i < len(buf):
        c = buf[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            j = buf.find(b"\n", i)
            if j < 0:
                return None
            i = j + 1
        elif c.isdigit():
            j = i
            while j < len(buf) and buf[j : j + 1].isdigit():
                j += 1
            fields.append(int(buf[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3 or i >= len(buf) or not buf[i : i + 1].isspace():
        return None
    w, h, maxv = fields
    if w <= 0 or h <= 0 or not (0 < maxv <= 255):
        return None
    return (buf[1:2].decode(), w, h, maxv, i + 1)


def decode_pnm(buf: bytes):
    """Binary P5 (gray) / P6 (RGB) payload → uint8 ndarray of shape
    (h, w) or (h, w, 3); None for anything malformed or truncated."""
    import numpy as np

    hd = _parse_pnm_header(buf)
    if hd is None:
        return None
    magic, w, h, _maxv, off = hd
    ch = 1 if magic == "5" else 3
    need = w * h * ch
    buf = bytes(buf)
    if len(buf) - off < need:
        return None
    a = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
    return a.reshape((h, w)) if ch == 1 else a.reshape((h, w, 3))


def encode_pnm(arr) -> bytes:
    """uint8 (h, w) or (h, w, 3) → binary P5/P6 bytes. The test-planting
    and thumbnail-sink twin of decode_pnm (round-trip is lossless)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB uint8")
    h, w = a.shape[0], a.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def _luma(a):
    """Integer BT.601 luma: deterministic (no float rounding ambiguity),
    identity on already-gray frames."""
    import numpy as np

    if a.ndim == 2:
        return a
    r = a[..., 0].astype(np.int64)
    g = a[..., 1].astype(np.int64)
    b = a[..., 2].astype(np.int64)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def _resize_nn(a, th: int, tw: int):
    """Nearest-neighbor resize via integer index maps — position (i, j)
    reads source pixel (i·h // th, j·w // tw), the 2-D analogue of the
    byte-subsampling stub (resize_thumbnail), and deterministic across
    platforms (pure integer indexing, no interpolation arithmetic)."""
    import numpy as np

    ys = (np.arange(th) * a.shape[0]) // th
    xs = (np.arange(tw) * a.shape[1]) // tw
    return a[np.ix_(ys, xs)] if a.ndim == 2 else a[np.ix_(ys, xs)]


_IMG_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, mean_luma double"
)


def decode_image_frames(
    documents: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """REAL decode over binary PNM payloads via the same Arrow-batched
    mapInPandas plumbing as decode_frames: emits (doc_id, width, height,
    channels, mean_luma) per DECODABLE payload; malformed/truncated
    payloads are dropped (a production pipeline routes them to a
    quarantine sink — same pattern as streaming/corpus.py's NULL-text
    skip). mean_luma is an exact integer-sum mean rounded HALF_UP to
    6 dp, so it is engine- and platform-identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "channels": [], "mean_luma": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                a = decode_pnm(b) if b is not None else None
                if a is None:
                    continue
                y = _luma(a)
                out["doc_id"].append(doc_id)
                out["height"].append(a.shape[0])
                out["width"].append(a.shape[1])
                out["channels"].append(1 if a.ndim == 2 else a.shape[2])
                out["mean_luma"].append(
                    np.floor(
                        int(y.sum(dtype=np.int64)) / y.size * 1e6 + 0.5
                    )
                    / 1e6
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "channels": pd.Series(out["channels"], dtype="int32"),
                    "mean_luma": pd.Series(out["mean_luma"], dtype="float64"),
                }
            )

    return documents.select("doc_id", payload_col).mapInPandas(
        run, schema=_IMG_DECODE_SCHEMA
    )


def resize_image_thumbnails(
    documents: DataFrame,
    target: int = 16,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL 2-D resize: decode → nearest-neighbor downsample to
    target×target luma → re-encoded P5 thumbnail payload (lossless to
    re-decode) plus its md5. The production thumbnail sink shape; same
    batching as resize_thumbnail (the 1-D stub)."""
    import hashlib

    schema = "doc_id bigint, thumb binary, thumb_md5 string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs, md5s = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                a = decode_pnm(b) if b is not None else None
                if a is None:
                    continue
                t = encode_pnm(_resize_nn(_luma(a), target, target))
                ids.append(doc_id)
                thumbs.append(t)
                md5s.append(hashlib.md5(t).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "thumb": pd.Series(thumbs, dtype=object),
                    "thumb_md5": pd.Series(md5s, dtype=object),
                }
            )

    return documents.select("doc_id", payload_col).mapInPandas(
        run, schema=schema
    )


def phash_image(
    documents: DataFrame,
    payload_col: str = "payload",
    bits: int = P.PHASH_BITS,
) -> DataFrame:
    """dHash over REAL pixels: decode → integer luma → nearest-neighbor
    resize to (r, r+1) where r = √bits → bit (i, j) set iff
    px[i, j] > px[i, j+1] (the classic horizontal-gradient dHash;
    r=4 → 16 bits at the default params, r=8 → the textbook 64-bit
    hash). Emits (doc_id, ph) — drop-in for phash_dedup_pairs, so the
    whole banded multi-index dedup runs unchanged on real pixel
    hashes (image_phash_dedup)."""
    import math

    r = int(math.isqrt(bits))
    if r * r != bits:
        raise ValueError(f"bits must be a perfect square for the 2-D dHash; got {bits}")

    schema = "doc_id bigint, ph bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, phs = [], []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                a = decode_pnm(b) if b is not None else None
                if a is None:
                    continue
                g = _resize_nn(_luma(a), r, r + 1).astype(np.int64)
                bitsv = (g[:, :-1] > g[:, 1:]).ravel()
                ph = 0
                for i, v in enumerate(bitsv):
                    if v:
                        ph |= 1 << i
                ids.append(doc_id)
                phs.append(ph)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ph": pd.Series(phs, dtype="int64"),
                }
            )

    return documents.select("doc_id", payload_col).mapInPandas(
        run, schema=schema
    )


def _label_components(mask):
    """4-connected component labels over a boolean mask, LINEAR in the
    pixel count, pure numpy: classic two-pass run labeling. Pass 1
    slices the mask into horizontal runs (vectorized edge detection —
    one run id per maximal foreground row segment); pass 2 unions
    vertically adjacent runs with path-halving union-find over the
    DEDUPED run-adjacency pairs (O(runs), and runs ≤ pixels/1 with
    equality only for a checkerboard). A component's final label is
    its minimum pixel index + 1 — identical to the fixpoint
    min-propagation this replaces, deterministic on any platform
    (integer ops only, no float) — but without that algorithm's
    O(component diameter) full-frame passes, which degraded toward
    quadratic on large bright regions (an overexposed 1080p frame
    stalled an executor task for minutes; this labels it in one pass)."""
    import numpy as np

    h, w = mask.shape
    m = mask.ravel()
    n = m.size
    # run starts: foreground pixel whose left neighbor (same row) is
    # background or absent
    starts = m.copy()
    starts[1:] &= ~m[:-1]
    row_first = np.arange(0, n, w)
    starts[row_first] = m[row_first]
    run_start_px = np.flatnonzero(starts).astype(np.int64)
    nruns = len(run_start_px)
    if nruns == 0:
        return np.zeros(mask.shape, np.int64)

    # run id of a foreground pixel = index of the last run start ≤ it
    # (binary search beats a full-frame cumsum: only foreground /
    # adjacency positions are ever looked up)
    def run_of(px):
        return np.searchsorted(run_start_px, px, side="right") - 1

    # vertical adjacencies: pixel p and p+w both foreground → their
    # runs touch; dedupe to unique run pairs before the union loop
    vpos = np.flatnonzero(m[:-w] & m[w:]).astype(np.int64)
    pa = run_of(vpos)
    pb = run_of(vpos + w)
    if len(pa):
        pairs = np.unique(pa.astype(np.int64) * nruns + pb.astype(np.int64))
        parent = np.arange(nruns, dtype=np.int64)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pk in pairs.tolist():
            ra, rb = find(pk // nruns), find(pk % nruns)
            if ra != rb:
                # root at the smaller run id (earlier min pixel index)
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        root = np.array([find(i) for i in range(nruns)], dtype=np.int64)
    else:
        root = np.arange(nruns, dtype=np.int64)
    # run ids are ordered by start pixel, and unions root at the
    # smaller id, so a component's root run holds its minimum pixel
    comp_label = run_start_px[root] + 1
    lab = np.zeros(n, dtype=np.int64)
    fg = np.flatnonzero(m)
    lab[fg] = comp_label[run_of(fg)]
    return lab.reshape(mask.shape)


def _comp_geoms(lab):
    """Per-component geometry in label order (pure numpy, integer/exact):
    pixel count, coordinate sums (for exact centroids), and bounding
    box — one bincount/ufunc.at pass over the labeled pixels. Shared by
    the blob detector and the ring verifier so both sides measure the
    same components the same way."""
    import numpy as np

    ids, inv = np.unique(lab[lab > 0], return_inverse=True)
    n = len(ids)
    if n == 0:
        z = np.zeros(0)
        return ids, z.astype(np.int64), z, z, z, z, z, z
    flat = np.flatnonzero(lab.ravel())
    ys, xs = np.unravel_index(flat, lab.shape)
    cnt = np.bincount(inv)
    sx = np.bincount(inv, weights=xs.astype(np.float64))
    sy = np.bincount(inv, weights=ys.astype(np.float64))
    big = np.int64(1) << 40
    x0 = np.full(n, big)
    y0 = np.full(n, big)
    x1 = np.full(n, -1)
    y1 = np.full(n, -1)
    np.minimum.at(x0, inv, xs)
    np.maximum.at(x1, inv, xs)
    np.minimum.at(y0, inv, ys)
    np.maximum.at(y1, inv, ys)
    return ids, cnt, sx, sy, x0, y0, x1, y1


def _ring_accept(mask, bright, ring_tol):
    """Concentric-structure verification (the reference's CircleTracker
    contract, externals/circle_detector.py:22 — a calibration marker is
    a set of NESTED ellipses sharing a center, never a single blob):
    bright component i is accepted iff at least one BELOW-threshold
    component nests strictly inside its bounding box with a centroid
    within ring_tol px (Chebyshev) of i's — i.e. ≥2 nested components
    share a center: the ring and its dark core. A solid bright blob has
    no interior dark component and is rejected; the frame-sized dark
    background fails the strict-nesting test. Returns a boolean accept
    vector in bright-label order."""
    import numpy as np

    _, bcnt, bsx, bsy, bx0, by0, bx1, by1 = bright
    nb = len(bcnt)
    accept = np.zeros(nb, dtype=bool)
    if nb == 0:
        return accept
    dark = _comp_geoms(_label_components(~mask))
    _, dcnt, dsx, dsy, dx0, dy0, dx1, dy1 = dark
    if len(dcnt) == 0:
        return accept
    dcx = dsx / dcnt
    dcy = dsy / dcnt
    for i in range(nb):
        inside = (
            (dx0 > bx0[i]) & (dx1 < bx1[i]) & (dy0 > by0[i]) & (dy1 < by1[i])
        )
        if not inside.any():
            continue
        cx = bsx[i] / bcnt[i]
        cy = bsy[i] / bcnt[i]
        near = (
            inside
            & (np.abs(dcx - cx) <= ring_tol)
            & (np.abs(dcy - cy) <= ring_tol)
        )
        accept[i] = bool(near.any())
    return accept


def _gauss_kernel1d(ksize, sigma):
    """cv2.getGaussianKernel semantics in numpy: ``sigma <= 0`` derives
    the default σ = 0.3·((ksize−1)/2 − 1) + 0.8, taps are
    exp(−(i−c)²/2σ²) normalized to sum 1."""
    import numpy as np

    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    c = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - c
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _sep_gauss(img, ksize, sigma):
    """Separable Gaussian-weighted local mean with replicate padding
    (cv2's BORDER_REPLICATE) — the windowed sum behind both
    GaussianBlur and ADAPTIVE_THRESH_GAUSSIAN_C, in pure numpy: pad,
    then one shifted-slice multiply-add per tap per axis (2·ksize
    vector ops over the frame; no Python-per-pixel work)."""
    import numpy as np

    k = _gauss_kernel1d(ksize, sigma)
    r = ksize // 2
    a = np.asarray(img, dtype=np.float64)
    p = np.pad(a, ((0, 0), (r, r)), mode="edge")
    outx = np.zeros_like(a)
    for i in range(ksize):
        outx += k[i] * p[:, i : i + a.shape[1]]
    p = np.pad(outx, ((r, r), (0, 0)), mode="edge")
    out = np.zeros_like(a)
    for i in range(ksize):
        out += k[i] * p[i : i + a.shape[0], :]
    return out


def _adaptive_inv_masks(y, block=29, cs=(36, 18, 3)):
    """The reference's three-pass adaptive binarization front-end
    (externals/circle_detector.py:214–240 find_pupil_circle_marker:
    GaussianBlur(3×3, σ=0.25) then three
    cv2.adaptiveThreshold(ADAPTIVE_THRESH_GAUSSIAN_C, THRESH_BINARY_INV,
    blockSize=29, C∈{36, 18, 3}) passes — 'complicated scene', 'normal
    scene', 'marker in low contrast'), re-expressed in pure numpy:
    foreground = pixels at least C darker than their 29×29
    Gaussian-weighted neighborhood mean. Local-contrast masks find the
    rings a single global intensity threshold misses on unevenly-lit or
    low-contrast frames. Float means throughout (cv2 rounds the mean
    image to uint8 first — a ≤0.5-gray-level re-expression difference,
    documented rather than emulated)."""
    blur = _sep_gauss(y, 3, 0.25)
    lmean = _sep_gauss(blur, block, -1.0)
    return [blur <= lmean - float(c) for c in cs]


def _outer_boundary(xs, ys):
    """Outer-contour sample of a pixel component: the per-scanline
    extremal pixels along BOTH axes (min/max x of every row ∪ min/max y
    of every column), deduplicated. Exact outer boundary for
    star-convex components — circles, ellipses, squares, and the
    annular rings the detector verifies — without tracing; the inner
    boundary of an annulus never enters, so the fit residual measures
    the OUTER silhouette the reference fits contours to."""
    import numpy as np

    pts = []
    for a, b in ((ys, xs), (xs, ys)):
        ua, inv = np.unique(a, return_inverse=True)
        lo = np.full(len(ua), np.iinfo(np.int64).max)
        hi = np.full(len(ua), np.iinfo(np.int64).min)
        np.minimum.at(lo, inv, b)
        np.maximum.at(hi, inv, b)
        if a is ys:
            pts.append(np.column_stack([lo, ua]))
            pts.append(np.column_stack([hi, ua]))
        else:
            pts.append(np.column_stack([ua, lo]))
            pts.append(np.column_stack([ua, hi]))
    allp = np.unique(np.concatenate(pts), axis=0)
    return allp[:, 0].astype(np.float64), allp[:, 1].astype(np.float64)


def _dist_pts_ellipse(cx, cy, full_major, full_minor, angle_deg, xs, ys):
    """Unsigned point-to-ellipse distances — the reference's
    dist_pts_ellipse (externals/methods.py:83) verbatim in vector
    numpy: move points to the ellipse frame, rotate onto the axes,
    normalize by the semi-axes, and scale the unit-circle deviation
    back to pixels."""
    import numpy as np

    rx, ry = full_major / 2.0, full_minor / 2.0
    th = np.radians(angle_deg)
    dx = xs - cx
    dy = ys - cy
    px = np.cos(th) * dx + np.sin(th) * dy
    py = -np.sin(th) * dx + np.cos(th) * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        nx = px / rx
        ny = py / ry
        norm_mag = np.sqrt(nx * nx + ny * ny)
        ratio = np.abs(norm_mag - 1.0) / norm_mag
        ex = nx * ratio * rx
        ey = ny * ratio * ry
        err = np.sqrt(ex * ex + ey * ey)
    return np.where(np.isfinite(err), err, np.inf)


def _ring_fit_residual(xs, ys):
    """Max ellipse-fit residual of a component's outer boundary — the
    reference's per-candidate acceptance quantity
    (circle_detector.py:514/:615 ``max(dist_pts_ellipse(e, c))`` with
    e = cv2.fitEllipse(c)): direct least-squares ellipse fit
    (Fitzgibbon/Halir-Flusser, the shared pupil_edge kernel) to the
    boundary, then the max unsigned distance of those same points.
    Mirrors the reference's degenerate-contour escape (<5 points →
    fit 0, accepted): too few points for a fit returns 0.0; a boundary
    no ellipse fits (degenerate scatter) returns +inf (rejected)."""
    import numpy as np

    from vedb_gaze_spark.operators.pupil_edge import (
        conic_to_ellipse,
        fit_ellipse_direct,
    )

    if len(xs) < 6:
        return 0.0
    conic = fit_ellipse_direct(xs, ys)
    ell = conic_to_ellipse(conic) if conic is not None else None
    if ell is None:
        return float("inf")
    ecx, ecy, fmaj, fmin, ang = ell
    if fmaj <= 0 or fmin <= 0:
        return float("inf")
    return float(_dist_pts_ellipse(ecx, ecy, fmaj, fmin, ang, xs, ys).max())


_DETECT_SCHEMA = (
    "user_id bigint, frame_id bigint, ts timestamp, marker_id int, "
    "x double, y double, size bigint, norm_x double, norm_y double"
)


def detect_frame_markers(
    frames: DataFrame,
    payload_col: str = "payload",
    threshold: int = 200,
    min_size: int = 4,
    require_rings: bool = False,
    ring_tol: float = 2.0,
) -> DataFrame:
    """Frame-level marker DETECTION on real pixels — the Spark-first
    analog of the reference's per-frame circle-marker detector
    (marker_detection.py:29 _find_circles_frame: detect blobs in a
    frame, emit per-detection location / normalized position / size /
    timestamp; the cv2 blob machinery is replaced by the declarative
    threshold → connected components → centroid chain, the same
    detection contract):

      decode (PNM, the real codec path) → integer luma → intensity
      threshold → 4-connected components (pure-numpy min-label
      propagation) → one row per component with ≥ min_size pixels:
      centroid (x, y — exact integer coordinate sums divided once,
      floor-rounded 6dp), pixel count, and norm_x/norm_y = centroid
      over frame dims (the reference's norm_pos).

    Input rows carry (user_id, frame_id, ts, payload); output is the
    detection STREAM that the marker pipelines consume (see
    detections_to_marker_stream). marker_id ranks components by their
    minimum pixel index — deterministic across platforms and
    partitionings. Arrow-batched mapInPandas over frames: each frame
    is one independent work item, so the operator scales with frame
    count exactly like decode_image_frames.

    ``require_rings`` (r9) switches on the reference's concentric-
    structure acceptance (externals/circle_detector.py:22 CircleTracker
    — a marker is a set of NESTED ellipses sharing a center): a bright
    component only counts when a below-threshold component nests
    strictly inside it with a centroid within ``ring_tol`` px, so a
    bright non-marker blob on a real frame is rejected exactly where
    the reference would reject it. Off by default — the plain-blob
    contract stays for generic detection streams."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "user_id": [], "frame_id": [], "ts": [], "marker_id": [],
                "x": [], "y": [], "size": [], "norm_x": [], "norm_y": [],
            }
            for uid, fid, ts, b in zip(
                pdf["user_id"], pdf["frame_id"], pdf["ts"], pdf[payload_col]
            ):
                a = decode_pnm(b) if b is not None else None
                if a is None:
                    continue
                y = _luma(a)
                h, w = y.shape
                mask = y >= threshold
                lab = _label_components(mask)
                bright = _comp_geoms(lab)
                ids, cnt, sx, sy = bright[:4]
                if len(ids) == 0:
                    continue
                ok = (
                    _ring_accept(mask, bright, ring_tol)
                    if require_rings
                    else np.ones(len(ids), dtype=bool)
                )
                mid = 0
                for i in range(len(ids)):
                    if cnt[i] < min_size or not ok[i]:
                        continue
                    mid += 1
                    out["user_id"].append(uid)
                    out["frame_id"].append(fid)
                    out["ts"].append(ts)
                    out["marker_id"].append(mid)
                    cx = np.floor(sx[i] / cnt[i] * 1e6 + 0.5) / 1e6
                    cy = np.floor(sy[i] / cnt[i] * 1e6 + 0.5) / 1e6
                    out["x"].append(cx)
                    out["y"].append(cy)
                    out["size"].append(int(cnt[i]))
                    out["norm_x"].append(np.floor(cx / w * 1e6 + 0.5) / 1e6)
                    out["norm_y"].append(np.floor(cy / h * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(out["user_id"], dtype="int64"),
                    "frame_id": pd.Series(out["frame_id"], dtype="int64"),
                    "ts": pd.Series(out["ts"], dtype="datetime64[us]"),
                    "marker_id": pd.Series(out["marker_id"], dtype="int32"),
                    "x": pd.Series(out["x"], dtype="float64"),
                    "y": pd.Series(out["y"], dtype="float64"),
                    "size": pd.Series(out["size"], dtype="int64"),
                    "norm_x": pd.Series(out["norm_x"], dtype="float64"),
                    "norm_y": pd.Series(out["norm_y"], dtype="float64"),
                }
            )

    return frames.select(
        "user_id", "frame_id", "ts", payload_col
    ).mapInPandas(run, schema=_DETECT_SCHEMA)


def detections_to_marker_stream(
    detections: DataFrame, value_col: str = "x"
) -> DataFrame:
    """Adapt the detection stream to the events schema the marker
    pipelines consume (user_id, event_id, ts, event_type='error',
    value) — value defaults to the detection's horizontal centroid, so
    marker_filter_cluster's grid clustering recovers marker POSITIONS
    (med_value ≈ the planted center). event_id packs (frame_id,
    marker_id) so duplicate-timestamp removal and ordering stay
    deterministic without a global row_number; the 2^20 multiplier
    keeps ids collision-free up to ~1M detections per frame (a frame
    is at most h*w/min_size components, far below that for any sane
    resolution), so a noisy/overexposed frame can never spill into the
    next frame's id range."""
    return detections.select(
        "user_id",
        (F.col("frame_id") * F.lit(1 << 20).cast("bigint")
         + F.col("marker_id")).alias("event_id"),
        "ts",
        F.lit("error").alias("event_type"),
        F.col(value_col).cast("double").alias("value"),
    )


_RING_SCHEMA = (
    "user_id bigint, frame_id bigint, ts timestamp, marker_id int, "
    "x double, y double, size bigint, norm_x double, norm_y double, "
    "marker_type string"
)


def detect_ring_markers(
    frames: DataFrame,
    payload_col: str = "payload",
    threshold: int | str = 200,
    min_size: int = 4,
    ring_tol: float = 2.0,
    fit_tol: float | None = None,
    adaptive_block: int = 29,
    adaptive_cs: tuple = (36, 18, 3),
) -> DataFrame:
    """Typed concentric-marker detection — the full CircleTracker
    contract including the Ref/Stop CLASSIFICATION (reference
    externals/circle_detector.py:339: 'Check if it is a Ref / stop
    marker by the mean gray scale of the ring' — ring mean ≥ 128 →
    Ref, else Stop). Both ring polarities are detected:

      · a BRIGHT ring (≥ threshold component) with a below-threshold
        core nested at its center, and
      · a DARK ring (< threshold component) with a bright core nested
        at its center (the white-on-black stop-marker family),

    each accepted only as ≥2 nested components sharing a centroid
    within ring_tol (the detect_frame_markers require_rings rule,
    applied in both directions). Ring components touching the frame
    border are never candidates — this is what keeps a dark FRAME
    BACKGROUND (which trivially 'contains' every bright blob) from
    masquerading as a ring, and mirrors the reference's full-ellipse
    requirement. marker_type comes from the ring component's exact
    integer mean luma against the reference's 128 split; detection
    rows are ordered per frame by the ring's minimum pixel index
    (deterministic on any platform), and x/y/size/norm follow the
    detect_frame_markers conventions (ring-component centroid — exact
    center by symmetry on planted markers).

    ``threshold="adaptive"`` (r14, default off) swaps the single
    global intensity split for the reference's robust binarization
    front-end (circle_detector.py:214–240: GaussianBlur + THREE
    ADAPTIVE_THRESH_GAUSSIAN_C/THRESH_BINARY_INV passes at
    blockSize=``adaptive_block``, C∈``adaptive_cs`` — 'complicated
    scene' / 'normal scene' / 'marker in low contrast'): each pass
    yields a local-contrast mask run through the SAME two-polarity
    nesting acceptance, candidates from all passes pooled before the
    outermost-ring suppression (the reference's found_pos duplicate
    discard). Markers on unevenly-lit or low-contrast frames — where
    a global threshold sees nothing — are found by the C=3 pass.

    ``fit_tol`` (r14, default off) adds the reference's per-candidate
    ellipse-fit-residual acceptance (circle_detector.py:514/:615
    ``max(dist_pts_ellipse(e, c))`` with e = cv2.fitEllipse(c);
    methods.py:83): the ring component's outer boundary is fitted with
    the direct least-squares ellipse (the shared pupil_edge kernel) and
    the candidate is rejected when any boundary point sits more than
    ``fit_tol`` px off the fit — a noisy non-elliptic blob that happens
    to nest no longer passes. Opt-in (None = off) because the planted
    operator-API pins use SQUARE rings, which the reference's own gate
    would reject (a square's corners sit ~0.15·side off its best
    ellipse); the reference's contrast-adaptive tolerance
    ``0.5 + (256 − img_contrast)/256`` maps to fit_tol≈0.5–1.5."""
    if isinstance(threshold, str) and threshold != "adaptive":
        raise ValueError(
            f"threshold must be an int or 'adaptive', got {threshold!r}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "user_id": [], "frame_id": [], "ts": [], "marker_id": [],
                "x": [], "y": [], "size": [], "norm_x": [], "norm_y": [],
                "marker_type": [],
            }
            for uid, fid, ts, b in zip(
                pdf["user_id"], pdf["frame_id"], pdf["ts"], pdf[payload_col]
            ):
                a = decode_pnm(b) if b is not None else None
                if a is None:
                    continue
                y = _luma(a)
                h, w = y.shape
                if threshold == "adaptive":
                    masks = _adaptive_inv_masks(
                        y, adaptive_block, adaptive_cs
                    )
                else:
                    masks = [y >= threshold]
                lum = y.astype(np.int64)
                cands = []
                for mask in masks:
                    for ring_mask, core_mask in (
                        (mask, ~mask), (~mask, mask)
                    ):
                        rlab = _label_components(ring_mask)
                        rids, rcnt, rsx, rsy, rx0, ry0, rx1, ry1 = (
                            _comp_geoms(rlab)
                        )
                        if len(rids) == 0:
                            continue
                        cids, ccnt, csx, csy, cx0, cy0, cx1, cy1 = _comp_geoms(
                            _label_components(core_mask)
                        )
                        if len(cids) == 0:
                            continue
                        ccx = csx / ccnt
                        ccy = csy / ccnt
                        # per-ring-component luma sums for the 128 split
                        rflat = np.flatnonzero(rlab.ravel())
                        rinv = np.searchsorted(rids, rlab.ravel()[rflat])
                        lsum = np.bincount(
                            rinv,
                            weights=lum.ravel()[rflat].astype(np.float64),
                        )
                        # explicit raster-order key: each component's
                        # minimum flat pixel index, computed from geometry
                        # so the cross-labeling sort below never depends on
                        # how _label_components happens to number labels
                        rfirst = np.full(len(rids), rlab.size, dtype=np.int64)
                        np.minimum.at(rfirst, rinv, rflat)
                        for i in range(len(rids)):
                            if rcnt[i] < min_size:
                                continue
                            # full ring only: border-touching components
                            # are background, not markers
                            if (
                                rx0[i] == 0 or ry0[i] == 0
                                or rx1[i] == w - 1 or ry1[i] == h - 1
                            ):
                                continue
                            rcx = rsx[i] / rcnt[i]
                            rcy = rsy[i] / rcnt[i]
                            nested = (
                                (cx0 > rx0[i]) & (cx1 < rx1[i])
                                & (cy0 > ry0[i]) & (cy1 < ry1[i])
                                & (np.abs(ccx - rcx) <= ring_tol)
                                & (np.abs(ccy - rcy) <= ring_tol)
                            )
                            if not nested.any():
                                continue
                            if fit_tol is not None:
                                sel = rflat[rinv == i]
                                bxs, bys = _outer_boundary(
                                    sel % w, sel // w
                                )
                                if _ring_fit_residual(bxs, bys) > fit_tol:
                                    continue
                            mtype = (
                                "ref" if lsum[i] / rcnt[i] >= 128.0
                                else "stop"
                            )
                            rhalf = (
                                max(rx1[i] - rx0[i], ry1[i] - ry0[i]) + 1
                            ) / 2.0
                            cands.append(
                                (int(rfirst[i]), rcx, rcy, int(rcnt[i]),
                                 rhalf, mtype)
                            )
                # one detection per MARKER, not per ring: a multi-ring
                # marker (bright ring / dark ring / bright dot) yields
                # one candidate per nested ring, all sharing a center.
                # Sorting on the explicit min-pixel-index key (raster
                # order, comparable ACROSS the bright and dark
                # labelings because it is pure pixel geometry) puts the
                # OUTERMOST ring first (the reference keys the marker
                # by its largest ellipse); later candidates at the same
                # center are the inner rings — suppressed.
                # Duplicate discard radius is SIZE-AWARE (the reference's
                # found_pos rule, circle_detector.py:262 'LA.norm(pos −
                # found_pos[k]) < found_size[k] + ellipse_size'): a later
                # candidate within (kept half-extent + its own) of a kept
                # center is the same marker seen by an inner ring OR by
                # another adaptive pass — never closer than ring_tol so
                # the exact-center suppression the planted pins rely on
                # is unchanged.
                mid = 0
                kept: list = []
                for _, rcx, rcy, sz, rhalf, mtype in sorted(cands):
                    if any(
                        ((rcx - kx) ** 2 + (rcy - ky) ** 2) ** 0.5
                        <= max(ring_tol, kr + rhalf)
                        for kx, ky, kr in kept
                    ):
                        continue
                    kept.append((rcx, rcy, rhalf))
                    mid += 1
                    cx = np.floor(rcx * 1e6 + 0.5) / 1e6
                    cy = np.floor(rcy * 1e6 + 0.5) / 1e6
                    out["user_id"].append(uid)
                    out["frame_id"].append(fid)
                    out["ts"].append(ts)
                    out["marker_id"].append(mid)
                    out["x"].append(cx)
                    out["y"].append(cy)
                    out["size"].append(sz)
                    out["norm_x"].append(np.floor(cx / w * 1e6 + 0.5) / 1e6)
                    out["norm_y"].append(np.floor(cy / h * 1e6 + 0.5) / 1e6)
                    out["marker_type"].append(mtype)
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(out["user_id"], dtype="int64"),
                    "frame_id": pd.Series(out["frame_id"], dtype="int64"),
                    "ts": pd.Series(out["ts"], dtype="datetime64[us]"),
                    "marker_id": pd.Series(out["marker_id"], dtype="int32"),
                    "x": pd.Series(out["x"], dtype="float64"),
                    "y": pd.Series(out["y"], dtype="float64"),
                    "size": pd.Series(out["size"], dtype="int64"),
                    "norm_x": pd.Series(out["norm_x"], dtype="float64"),
                    "norm_y": pd.Series(out["norm_y"], dtype="float64"),
                    "marker_type": pd.Series(out["marker_type"], dtype="object"),
                }
            )

    return frames.select(
        "user_id", "frame_id", "ts", payload_col
    ).mapInPandas(run, schema=_RING_SCHEMA)


_CHECKERBOARD_SCHEMA = (
    "user_id bigint, frame_id bigint, ts timestamp, marker_id int, "
    "x double, y double, size bigint, norm_x double, norm_y double, "
    "corner_xs array<double>, corner_ys array<double>"
)


def _corner_subpix(y, px, py, win=3, iters=4):
    """Sub-pixel corner refinement — the cv2.cornerSubPix contract in
    pure numpy (Förstner gradient-orthogonality): the true corner q
    satisfies ∇I(p)·(q − p) = 0 for every window pixel p (on an edge
    the gradient is normal to it; at the saddle all edge normals
    intersect), so q solves G q = b with G = Σ∇I∇Iᵀ,
    b = Σ∇I∇Iᵀ p. Central-difference gradients, uniform window,
    re-centered per iteration; returns the input coordinate unchanged
    near borders or when G is (near-)singular — never worse than the
    integer junction estimate."""
    import numpy as np

    h, w = y.shape
    yf = y.astype(np.float64)
    qx, qy = float(px), float(py)
    for _ in range(iters):
        x0, y0 = int(round(qx)), int(round(qy))
        if (
            x0 - win - 1 < 0 or y0 - win - 1 < 0
            or x0 + win + 1 >= w or y0 + win + 1 >= h
        ):
            return float(px), float(py)
        patch = yf[y0 - win - 1 : y0 + win + 2, x0 - win - 1 : x0 + win + 2]
        gx = (patch[1:-1, 2:] - patch[1:-1, :-2]) / 2.0
        gy = (patch[2:, 1:-1] - patch[:-2, 1:-1]) / 2.0
        ys_, xs_ = np.mgrid[
            y0 - win : y0 + win + 1, x0 - win : x0 + win + 1
        ]
        gxx = (gx * gx).sum()
        gxy = (gx * gy).sum()
        gyy = (gy * gy).sum()
        det = gxx * gyy - gxy * gxy
        if det <= 1e-9 * max(gxx + gyy, 1.0) ** 2:
            return float(px), float(py)
        bx = (gx * gx * xs_ + gx * gy * ys_).sum()
        by = (gx * gy * xs_ + gy * gy * ys_).sum()
        nqx = (gyy * bx - gxy * by) / det
        nqy = (gxx * by - gxy * bx) / det
        if abs(nqx - qx) < 1e-4 and abs(nqy - qy) < 1e-4:
            qx, qy = nqx, nqy
            break
        qx, qy = nqx, nqy
    # a refinement that wandered off the junction is a failure, not an
    # answer (cornerSubPix's implicit window bound)
    if abs(qx - px) > win or abs(qy - py) > win:
        return float(px), float(py)
    return qx, qy


def detect_checkerboard_frames(
    frames: DataFrame,
    payload_col: str = "payload",
    board: tuple = (3, 6),
    threshold: int = 128,
    refine_subpixel: bool = False,
) -> DataFrame:
    """Checkerboard calibration-marker detection on real pixels — the
    reference's SECOND marker type (marker_detection.py:185
    find_checkerboard_frame / :260 find_checkerboard: per frame,
    cv2.findChessboardCorners finds the board's inner-corner grid,
    corners are averaged to the marker location and normalized to
    norm_pos). The cv2 corner machinery is replaced by a deterministic
    numpy saddle-point detector with the same acceptance contract —
    the FULL inner-corner grid or nothing:

      decode (PNM) → integer luma → binarize at threshold → 2×2
      saddle response (a pixel junction where diagonal neighbors agree
      and adjacent ones differ — exactly the four-cells-meet corner of
      a checkerboard) → grid validation: the saddle set must form the
      COMPLETE board[0]×board[1] cross product of its distinct column/
      row coordinates, else the frame rejects (findChessboardCorners'
      all-corners-or-failure behavior — a stray saddle from scene
      texture rejects the frame rather than corrupting the mean).

    ``board`` follows the reference's checkerboard_size convention:
    (points per row, points per column) of INNER corners — (3, 6) is
    the reference default, 18 corners. Output: one row per DETECTED
    frame, marker_id=1, with the row-major corner arrays (the
    reference's location_full_checkerboard, at half-pixel junction
    coordinates), their mean as x/y (location) and norm_x/norm_y
    (norm_pos — mean over frame dims), size = corner count; all
    coordinates floor-rounded 6dp (exact integer sums divided once).
    ``refine_subpixel`` (r10) turns on the cv2.cornerSubPix contract in
    pure numpy (_corner_subpix: the Förstner gradient-orthogonality
    solve over the ORIGINAL luma, iterated) — on anti-aliased real
    video it recovers the fractional corner the half-pixel junction
    quantizes away (pinned < 0.1 px on a supersampled board). Off by
    default: on planted hard-edge boards the junction coordinate IS
    the exact corner, and the registered faces stay bit-stable.

    Arrow-batched mapInPandas over frames — one independent work item
    per frame, the detect_frame_markers scale shape."""
    nx, ny = int(board[0]), int(board[1])
    if nx < 2 or ny < 2:
        raise ValueError(f"board must be at least 2x2 inner corners; got {board}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "user_id": [], "frame_id": [], "ts": [], "marker_id": [],
                "x": [], "y": [], "size": [], "norm_x": [], "norm_y": [],
                "corner_xs": [], "corner_ys": [],
            }
            for uid, fid, ts, b in zip(
                pdf["user_id"], pdf["frame_id"], pdf["ts"], pdf[payload_col]
            ):
                a = decode_pnm(b) if b is not None else None
                if a is None:
                    continue
                y = _luma(a)
                h, w = y.shape
                m = y >= threshold
                # saddle: the 2x2 junction where diagonals agree and
                # neighbors differ (four alternating cells meet)
                p00 = m[:-1, :-1]
                p01 = m[:-1, 1:]
                p10 = m[1:, :-1]
                p11 = m[1:, 1:]
                sad = (p00 == p11) & (p01 == p10) & (p00 != p01)
                sy_, sx_ = np.nonzero(sad)
                if len(sx_) != nx * ny:
                    continue
                ux = np.unique(sx_)
                uy = np.unique(sy_)
                if len(ux) != nx or len(uy) != ny:
                    continue
                # complete-grid check: every (row, col) junction present
                got = {(int(yy), int(xx)) for yy, xx in zip(sy_, sx_)}
                if got != {(int(yy), int(xx)) for yy in uy for xx in ux}:
                    continue
                # row-major corner order (the findChessboardCorners
                # orientation-normalized order on an upright board);
                # junction (r, c) sits between pixels → +0.5 coordinate
                cxs = [float(xx) + 0.5 for yy in uy for xx in ux]
                cys = [float(yy) + 0.5 for yy in uy for xx in ux]
                if refine_subpixel:
                    ref = [
                        _corner_subpix(y, cx_, cy_)
                        for cx_, cy_ in zip(cxs, cys)
                    ]
                    r6c = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)
                    cxs = [r6c(cx_) for cx_, _ in ref]
                    cys = [r6c(cy_) for _, cy_ in ref]
                n = nx * ny
                mx = np.floor(sum(cxs) / n * 1e6 + 0.5) / 1e6
                my = np.floor(sum(cys) / n * 1e6 + 0.5) / 1e6
                out["user_id"].append(uid)
                out["frame_id"].append(fid)
                out["ts"].append(ts)
                out["marker_id"].append(1)
                out["x"].append(mx)
                out["y"].append(my)
                out["size"].append(n)
                out["norm_x"].append(np.floor(mx / w * 1e6 + 0.5) / 1e6)
                out["norm_y"].append(np.floor(my / h * 1e6 + 0.5) / 1e6)
                out["corner_xs"].append(cxs)
                out["corner_ys"].append(cys)
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(out["user_id"], dtype="int64"),
                    "frame_id": pd.Series(out["frame_id"], dtype="int64"),
                    "ts": pd.Series(out["ts"], dtype="datetime64[us]"),
                    "marker_id": pd.Series(out["marker_id"], dtype="int32"),
                    "x": pd.Series(out["x"], dtype="float64"),
                    "y": pd.Series(out["y"], dtype="float64"),
                    "size": pd.Series(out["size"], dtype="int64"),
                    "norm_x": pd.Series(out["norm_x"], dtype="float64"),
                    "norm_y": pd.Series(out["norm_y"], dtype="float64"),
                    "corner_xs": pd.Series(out["corner_xs"], dtype="object"),
                    "corner_ys": pd.Series(out["corner_ys"], dtype="object"),
                }
            )

    return frames.select(
        "user_id", "frame_id", "ts", payload_col
    ).mapInPandas(run, schema=_CHECKERBOARD_SCHEMA)


def image_phash_dedup(
    documents: DataFrame,
    payload_col: str = "payload",
    bits: int = P.PHASH_BITS,
    bands: int = P.PHASH_BANDS,
    max_hamming: int = P.PHASH_MAX_HAMMING,
) -> DataFrame:
    """Perceptual near-duplicate detection over REAL images: the pixel
    dHash (phash_image) feeding the same banded multi-index Hamming
    join as the stubbed operator — recall is exact by the same
    pigeonhole argument; only the hash source changed. End-to-end
    pinned on planted PNM frames in tests/test_sources.py."""
    return phash_dedup_pairs(
        phash_image(documents, payload_col, bits), bits, bands, max_hamming
    )



def _moment_ellipses(y, mask, min_size, max_size):
    """Second-central-moment ellipse fit of every qualifying connected
    component of ``mask`` (size band + border rejection), in raster
    order of each component's first pixel. Returns a list of tuples
    (first_pixel_index, cx, cy, n, axis_minor, axis_major, angle_deg,
    confidence) — the shared measurement kernel of the pupil detector
    and the ellipse-marker detector, so the dark and bright sides
    measure components identically. Axes are the full 4·√λ moment axes
    (exact for a filled ellipse); confidence is the pixel-count /
    fitted-ellipse-area roundness ratio clipped to [0, 1]."""
    import numpy as np

    h, w = y.shape
    lab = _label_components(mask)
    ids, cnt, sx, sy, x0, y0, x1, y1 = _comp_geoms(lab)
    out = []
    if len(ids) == 0:
        return out
    flat = np.flatnonzero(lab.ravel())
    inv = np.searchsorted(ids, lab.ravel()[flat])
    xs = (flat % w).astype(np.float64)
    ys_ = (flat // w).astype(np.float64)
    sxx = np.bincount(inv, weights=xs * xs)
    syy = np.bincount(inv, weights=ys_ * ys_)
    sxy = np.bincount(inv, weights=xs * ys_)
    first = np.full(len(ids), lab.size, dtype=np.int64)
    np.minimum.at(first, inv, flat)
    for i in range(len(ids)):
        n = int(cnt[i])
        if n < min_size or n > max_size:
            continue
        if x0[i] == 0 or y0[i] == 0 or x1[i] == w - 1 or y1[i] == h - 1:
            continue
        cx = sx[i] / n
        cy = sy[i] / n
        mu20 = sxx[i] / n - cx * cx
        mu02 = syy[i] / n - cy * cy
        mu11 = sxy[i] / n - cx * cy
        tr2 = (mu20 + mu02) / 2.0
        det = np.sqrt(((mu20 - mu02) / 2.0) ** 2 + mu11 * mu11)
        lam_max = max(tr2 + det, 0.0)
        lam_min = max(tr2 - det, 0.0)
        ax_major = 4.0 * np.sqrt(lam_max)
        ax_minor = 4.0 * np.sqrt(lam_min)
        ell_area = np.pi * ax_major * ax_minor / 4.0
        conf = min(n / ell_area, 1.0) if ell_area > 0 else 0.0
        ang = np.degrees(0.5 * np.arctan2(2.0 * mu11, mu20 - mu02))
        out.append(
            (int(first[i]), cx, cy, n, ax_minor, ax_major, ang, conf)
        )
    return out


_PUPIL_SCHEMA = (
    "user_id bigint, frame_id bigint, ts timestamp, "
    "x double, y double, norm_x double, norm_y double, "
    "axis_minor double, axis_major double, diameter double, "
    "angle_deg double, confidence double, luminance double"
)


def detect_pupil_frames(
    frames: DataFrame,
    payload_col: str = "payload",
    threshold: int = 60,
    min_size: int = 10,
    max_size: int = 40_000,
    refine: str = "none",
) -> DataFrame:
    """Real-pixel PUPIL detection — the dark-component ellipse-moments
    mirror of detect_frame_markers, closing the reference's last
    frame-level capability (pupil_detection_pl.py:11 plabs_detect_pupil:
    Pupil Labs Detector2D over each eye-video frame, emitting ellipse /
    location / norm_pos / confidence / luminance per frame):

      decode (PNM) → integer luma → threshold BELOW (the pupil is the
      dark blob; Detector2D's intensity_range coarse gate) → 4-connected
      components → size band [min_size, max_size] (pupil_size_min/max)
      and border-rejection (a pupil is interior; eyelid shadow touching
      the frame edge is not) → per-component second central moments →
      moment ellipse: axes 4·√λ of the covariance eigenvalues (exact
      for a filled ellipse), orientation ½·atan2(2µ11, µ20−µ02) →
      confidence = pixel-count / fitted-ellipse-area roundness ratio
      (Detector2D's area-support idea: 1.0 for a true filled ellipse,
      degrading for ragged non-elliptical blobs), clipped to [0, 1].

    ONE row per FRAME, always — Detector2D emits a datum per frame with
    confidence 0.0 when nothing qualifies, and downstream blink/
    confidence gates (detect_blinks' conf<threshold runs) depend on the
    zero-confidence rows existing. The best candidate per frame is the
    max-confidence one (ties: larger, then first in raster order —
    deterministic across partitionings). luminance is the frame's mean
    luma (the reference attaches fr.mean() to every datum).

    ``refine="edge"`` (r11) runs the Detector2D-style refinement the
    reference delegates to the Pupil Labs C++ internals, re-expressed
    from the PUBLIC algorithms (operators/pupil_edge.py: Canny 1986
    edges → annulus-gated direct least-squares ellipse fit, Fitzgibbon
    1996 / Halir & Flusser 1998 → outline edge-support confidence).
    Refinement replaces the winning candidate's ellipse and reports the
    edge-support ratio as confidence; when the fit is impossible
    (no edges, degeneracy, support < 0.3) the moments row stands, so
    refine can only sharpen a detection, never drop one. The default
    stays "none": the moments detector is the deterministic, SQL-
    oracle-able contract.
    Arrow-batched mapInPandas; each frame is one independent work item,
    so this scales with frame count exactly like the marker detectors.
    """
    if refine not in ("none", "edge"):
        raise ValueError(f"refine must be 'none' or 'edge', got {refine!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "user_id", "frame_id", "ts", "x", "y", "norm_x", "norm_y",
                "axis_minor", "axis_major", "diameter", "angle_deg",
                "confidence", "luminance",
            )}

            def r6(v):
                return float(np.floor(v * 1e6 + 0.5) / 1e6)

            for uid, fid, ts, b in zip(
                pdf["user_id"], pdf["frame_id"], pdf["ts"], pdf[payload_col]
            ):
                a = decode_pnm(b) if b is not None else None
                if a is None:
                    # null/undecodable payload: the per-frame contract
                    # holds — emit the confidence-0 datum (luminance 0,
                    # all-zero ellipse) so downstream blink/confidence
                    # gates see the frame as a low-confidence sample
                    # instead of a silently missing timestamp (ADVICE
                    # r10; the reference's Detector2D likewise emits a
                    # datum for every frame it is handed).
                    lum, best = 0.0, None
                else:
                    y = _luma(a)
                    h, w = y.shape
                    lum = r6(y.astype(np.int64).sum() / y.size)
                    best = None  # (conf, cnt, -first, row-values)
                    for (
                        fidx, cx, cy, n, ax_minor, ax_major, ang, conf
                    ) in _moment_ellipses(
                        y, y <= threshold, min_size, max_size
                    ):
                        key = (conf, n, -fidx)
                        if best is None or key > best[0]:
                            best = (
                                key,
                                (cx, cy, ax_minor, ax_major, ang, conf),
                            )
                out["user_id"].append(uid)
                out["frame_id"].append(fid)
                out["ts"].append(ts)
                out["luminance"].append(lum)
                if best is None:
                    for k in (
                        "x", "y", "norm_x", "norm_y", "axis_minor",
                        "axis_major", "diameter", "angle_deg", "confidence",
                    ):
                        out[k].append(0.0)
                else:
                    cx, cy, ax_minor, ax_major, ang, conf = best[1]
                    if refine == "edge":
                        from vedb_gaze_spark.operators.pupil_edge import (
                            refine_pupil_ellipse,
                        )

                        ref = refine_pupil_ellipse(
                            y, (cx, cy, ax_minor, ax_major, ang)
                        )
                        if ref is not None:
                            cx, cy, ax_minor, ax_major, ang, conf = ref
                    out["x"].append(r6(cx))
                    out["y"].append(r6(cy))
                    out["norm_x"].append(r6(cx / w))
                    out["norm_y"].append(r6(cy / h))
                    out["axis_minor"].append(r6(ax_minor))
                    out["axis_major"].append(r6(ax_major))
                    out["diameter"].append(r6(ax_major))
                    out["angle_deg"].append(r6(ang) if ang >= 0 else -r6(-ang))
                    out["confidence"].append(r6(conf))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(out["user_id"], dtype="int64"),
                    "frame_id": pd.Series(out["frame_id"], dtype="int64"),
                    "ts": pd.Series(out["ts"], dtype="datetime64[us]"),
                    **{
                        k: pd.Series(out[k], dtype="float64")
                        for k in (
                            "x", "y", "norm_x", "norm_y", "axis_minor",
                            "axis_major", "diameter", "angle_deg",
                            "confidence", "luminance",
                        )
                    },
                }
            )

    return frames.select(
        "user_id", "frame_id", "ts", payload_col
    ).mapInPandas(run, schema=_PUPIL_SCHEMA)


_ELLIPSE_SCHEMA = (
    "user_id bigint, frame_id bigint, ts timestamp, marker_id int, "
    "x double, y double, norm_x double, norm_y double, "
    "axis_minor double, axis_major double, angle_deg double, "
    "confidence double"
)


def detect_ellipse_markers(
    frames: DataFrame,
    payload_col: str = "payload",
    threshold: int = 200,
    min_size: int = 10,
    max_size: int = 40_000,
    min_confidence: float = 0.5,
) -> DataFrame:
    """Bright-side ellipse detection: every qualifying above-threshold
    component with its moment-ellipse geometry — the marker twin of
    detect_pupil_frames (shared _moment_ellipses kernel), and the
    producer of the ellipse rows marker_3d_pose consumes (reference
    CircleTracker keeps the fitted ellipse of each detected ring,
    externals/circle_detector.py:339; detect_frame_markers deliberately
    emits only centroid/size — this face adds the axes/orientation a
    pose solve needs). One row per component ≥ min_confidence
    roundness, marker_id in raster order of first pixel — the same
    deterministic id rule as detect_frame_markers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "user_id", "frame_id", "ts", "marker_id", "x", "y",
                "norm_x", "norm_y", "axis_minor", "axis_major",
                "angle_deg", "confidence",
            )}

            def r6(v):
                return float(np.floor(abs(v) * 1e6 + 0.5) / 1e6) * (
                    1.0 if v >= 0 else -1.0
                )

            for uid, fid, ts, b in zip(
                pdf["user_id"], pdf["frame_id"], pdf["ts"], pdf[payload_col]
            ):
                a = decode_pnm(b) if b is not None else None
                if a is None:
                    continue
                y = _luma(a)
                h, w = y.shape
                mid = 0
                for (
                    _fidx, cx, cy, _n, ax_minor, ax_major, ang, conf
                ) in sorted(
                    _moment_ellipses(y, y >= threshold, min_size, max_size)
                ):
                    if conf < min_confidence:
                        continue
                    mid += 1
                    out["user_id"].append(uid)
                    out["frame_id"].append(fid)
                    out["ts"].append(ts)
                    out["marker_id"].append(mid)
                    out["x"].append(r6(cx))
                    out["y"].append(r6(cy))
                    out["norm_x"].append(r6(cx / w))
                    out["norm_y"].append(r6(cy / h))
                    out["axis_minor"].append(r6(ax_minor))
                    out["axis_major"].append(r6(ax_major))
                    out["angle_deg"].append(r6(ang))
                    out["confidence"].append(r6(conf))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(out["user_id"], dtype="int64"),
                    "frame_id": pd.Series(out["frame_id"], dtype="int64"),
                    "ts": pd.Series(out["ts"], dtype="datetime64[us]"),
                    "marker_id": pd.Series(out["marker_id"], dtype="int32"),
                    **{
                        k: pd.Series(out[k], dtype="float64")
                        for k in (
                            "x", "y", "norm_x", "norm_y", "axis_minor",
                            "axis_major", "angle_deg", "confidence",
                        )
                    },
                }
            )

    return frames.select(
        "user_id", "frame_id", "ts", payload_col
    ).mapInPandas(run, schema=_ELLIPSE_SCHEMA)


def _ellipse_points(cx, cy, ax_a, ax_b, angle_deg, num_pts=10):
    """num_pts parameter-sampled points of an ellipse given center,
    FULL axes and orientation — the reference's getEllipsePts contract
    (externals/circle_detector.py:706: a/2·cosθ, b/2·sinθ rotated then
    translated), pure numpy."""
    import numpy as np

    th = np.linspace(0.0, 2.0 * np.pi, num=num_pts, endpoint=False)
    c, s = np.cos(np.radians(angle_deg)), np.sin(np.radians(angle_deg))
    px = ax_a / 2.0 * np.cos(th)
    py = ax_b / 2.0 * np.sin(th)
    return np.column_stack(
        (cx + c * px - s * py, cy + s * px + c * py)
    )


_POSE_SCHEMA = (
    "user_id bigint, frame_id bigint, ts timestamp, marker_id int, "
    "tx double, ty double, tz double, "
    "rx_deg double, ry_deg double, rz_deg double, reproj_rms double"
)


def marker_3d_pose(
    ellipses: DataFrame,
    fx: float,
    fy: float,
    cx0: float,
    cy0: float,
    marker_diameter: float = 7.6,
) -> DataFrame:
    """3-D marker pose from a detected ellipse + pinhole intrinsics —
    the reference's marker_3d_pose (externals/circle_detector.py:729:
    sample the detected ellipse and the physical circle at the same
    parameters, then solvePnP). The parameter-sampled correspondence
    is consistent with an AFFINE map — it carries no perspective
    signal — so the rigid pose the reference's solvePnP extracts from
    it is exactly the closed-form WEAK-PERSPECTIVE circle pose, which
    is what this computes directly (pure numpy, no cv2):

      depth      tz = f·D / axis_major (the full-length diameter is
                 the one along the tilt axis, unforeshortened)
      center     (tx, ty) = tz · K⁻¹-normalized ellipse center ray
      tilt       σ = arccos(axis_minor / axis_major), about the
                 image-plane axis along the ellipse MAJOR axis
                 (the unforeshortened diameter IS the tilt axis);
                 R = Rodrigues((cos α, sin α, 0), σ)

    The σ↔−σ two-fold ambiguity is inherent to a single conic view
    (the reference's solvePnP silently picks one branch too); this
    picks σ ≥ 0. Intrinsics contract: (fx, fy) focal lengths and
    (cx0, cy0) principal point in PIXELS, zero skew, distortion-free
    coordinates (undistort upstream — the reference's cam_model
    carries the same assumption), f = √(fx·fy) for the depth scale.
    Output per detection: translation in marker_diameter's units,
    intrinsic XYZ Euler angles in degrees, and the full-perspective
    reprojection RMS of 10 sampled correspondences (~0 for
    fronto-parallel views, small for slanted ones — the honest
    residual of the weak-perspective model).

    One tiny closed-form solve per detection row — Arrow-batched
    mapInPandas, embarrassingly parallel, no shuffle."""
    import numpy as np

    K = np.array([[fx, 0, cx0], [0, fy, cy0], [0, 0, 1.0]])
    Kinv = np.linalg.inv(K)
    f = float(np.sqrt(fx * fy))
    plane = _ellipse_points(0.0, 0.0, marker_diameter, marker_diameter, 0.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "user_id", "frame_id", "ts", "marker_id",
                "tx", "ty", "tz", "rx_deg", "ry_deg", "rz_deg",
                "reproj_rms",
            )}

            def r6(v):
                return float(np.floor(abs(v) * 1e6 + 0.5) / 1e6) * (
                    1.0 if v >= 0 else -1.0
                )

            for row in pdf.itertuples(index=False):
                if row.axis_major <= 0:
                    continue
                tz = f * marker_diameter / row.axis_major
                ray = Kinv @ np.array([row.x, row.y, 1.0])
                t = tz * ray
                ratio = min(row.axis_minor / row.axis_major, 1.0)
                sigma = np.arccos(ratio)
                al = np.radians(row.angle_deg)
                ax = np.array([np.cos(al), np.sin(al), 0.0])
                Kx = np.array(
                    [
                        [0.0, -ax[2], ax[1]],
                        [ax[2], 0.0, -ax[0]],
                        [-ax[1], ax[0], 0.0],
                    ]
                )
                R = (
                    np.eye(3)
                    + np.sin(sigma) * Kx
                    + (1.0 - np.cos(sigma)) * (Kx @ Kx)
                )
                ry = np.arcsin(np.clip(-R[2, 0], -1.0, 1.0))
                rx = np.arctan2(R[2, 1], R[2, 2])
                rz = np.arctan2(R[1, 0], R[0, 0])
                # full-perspective reprojection of the plane circle vs
                # the same param-sampled image ellipse — the honest
                # residual of the weak-perspective model
                img = _ellipse_points(
                    row.x, row.y, row.axis_major, row.axis_minor,
                    row.angle_deg,
                )
                p3 = np.column_stack((plane, np.zeros(len(plane))))
                cam = (R @ p3.T).T + t
                uv = (K @ cam.T).T
                uv = uv[:, :2] / uv[:, 2:3]
                d2 = ((uv - img) ** 2).sum(axis=1)
                rms = float(np.sqrt(d2.mean()))
                out["user_id"].append(row.user_id)
                out["frame_id"].append(row.frame_id)
                out["ts"].append(row.ts)
                out["marker_id"].append(row.marker_id)
                out["tx"].append(r6(t[0]))
                out["ty"].append(r6(t[1]))
                out["tz"].append(r6(t[2]))
                out["rx_deg"].append(r6(np.degrees(rx)))
                out["ry_deg"].append(r6(np.degrees(ry)))
                out["rz_deg"].append(r6(np.degrees(rz)))
                out["reproj_rms"].append(r6(rms))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(out["user_id"], dtype="int64"),
                    "frame_id": pd.Series(out["frame_id"], dtype="int64"),
                    "ts": pd.Series(out["ts"], dtype="datetime64[us]"),
                    "marker_id": pd.Series(out["marker_id"], dtype="int32"),
                    **{
                        k: pd.Series(out[k], dtype="float64")
                        for k in (
                            "tx", "ty", "tz", "rx_deg", "ry_deg",
                            "rz_deg", "reproj_rms",
                        )
                    },
                }
            )

    return ellipses.select(
        "user_id", "frame_id", "ts", "marker_id",
        "x", "y", "axis_minor", "axis_major", "angle_deg",
    ).mapInPandas(run, schema=_POSE_SCHEMA)
