"""Pupil-Labs pldata capture-format source (msgpack stream + npy sidecar).

Re-expresses ``load_pldata_file`` (reference
vedb_gaze/externals/file_methods.py:133): a recording directory holds
``<topic>.pldata`` — a raw concatenation of msgpack-packed 2-tuples
``(topic, datum_bytes)`` where ``datum_bytes`` is itself a msgpack map
(the reference wraps it lazily as Serialized_Dict) — plus a
``<topic>_timestamps.npy`` sidecar carrying the capture clock
(float64 seconds). ``PLData_Writer`` (file_methods.py:157) is the write
side this module's test twin mirrors byte-for-byte.

The container ships no msgpack package, so this module carries a
pure-Python codec for the public MessagePack spec (msgpack.org) — the
subset the capture format uses (nil/bool/int/float/str/bin/array/map
with ``use_bin_type=True`` framing; ext types are rejected loudly) —
plus a minimal parser for the public NPY v1/v2 container so the sidecar
never needs driver-side numpy file IO on executors.

Spark-first mapping (the tarshards.py / y4m.py discipline):

- ``binaryFile`` lists the ``.pldata`` files — one task per recording
  file, the capture-session parallelism unit (a rig writes one
  directory per recording).
- An Arrow-batched ``mapInPandas`` walks the msgpack stream and emits
  TYPED rows in bounded chunks: field extraction happens inside the
  same pass (dotted-path spec, e.g. ``ellipse.center.0``), so the
  Python-side cost is one decode per datum and the output columns are
  narrow typed scalars, never opaque blobs.
- The timestamps sidecar is its own (tiny) ``binaryFile`` scan joined
  on (recording, idx) — recording-sized rows, broadcast-friendly.

Like the reference (which returns an empty PLData on IOError), a
directory glob matching no capture files yields an EMPTY typed
DataFrame rather than raising — a sweep over many sessions must not
die on the sessions that never recorded the topic.
"""

from __future__ import annotations

import ast
import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------
# MessagePack codec (public spec, msgpack.org) — the capture subset.
# ---------------------------------------------------------------------


def msgpack_packb(o) -> bytes:
    """Pack one object with ``use_bin_type=True`` semantics: str → str
    family, bytes → bin family, float → float64, int → smallest width.
    The byte output matches what the reference's writer produced, so
    files written by the twin load in actual Pupil Labs tooling."""
    out: list[bytes] = []
    _pack_into(out, o)
    return b"".join(out)


def _pack_into(out: list[bytes], o) -> None:
    if o is None:
        out.append(b"\xc0")
    elif o is True:
        out.append(b"\xc3")
    elif o is False:
        out.append(b"\xc2")
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(bytes([o]))
        elif -32 <= o < 0:
            out.append(struct.pack("b", o))
        elif o > 0:
            if o <= 0xFF:
                out.append(b"\xcc" + struct.pack("B", o))
            elif o <= 0xFFFF:
                out.append(b"\xcd" + struct.pack(">H", o))
            elif o <= 0xFFFFFFFF:
                out.append(b"\xce" + struct.pack(">I", o))
            elif o <= 0xFFFFFFFFFFFFFFFF:
                out.append(b"\xcf" + struct.pack(">Q", o))
            else:
                raise OverflowError(f"int too large for msgpack: {o}")
        else:
            if o >= -0x80:
                out.append(b"\xd0" + struct.pack("b", o))
            elif o >= -0x8000:
                out.append(b"\xd1" + struct.pack(">h", o))
            elif o >= -0x80000000:
                out.append(b"\xd2" + struct.pack(">i", o))
            elif o >= -0x8000000000000000:
                out.append(b"\xd3" + struct.pack(">q", o))
            else:
                raise OverflowError(f"int too small for msgpack: {o}")
    elif isinstance(o, float):
        out.append(b"\xcb" + struct.pack(">d", o))
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(bytes([0xA0 | n]))
        elif n <= 0xFF:
            out.append(b"\xd9" + struct.pack("B", n))
        elif n <= 0xFFFF:
            out.append(b"\xda" + struct.pack(">H", n))
        else:
            out.append(b"\xdb" + struct.pack(">I", n))
        out.append(b)
    elif isinstance(o, (bytes, bytearray, memoryview)):
        b = bytes(o)
        n = len(b)
        if n <= 0xFF:
            out.append(b"\xc4" + struct.pack("B", n))
        elif n <= 0xFFFF:
            out.append(b"\xc5" + struct.pack(">H", n))
        else:
            out.append(b"\xc6" + struct.pack(">I", n))
        out.append(b)
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(bytes([0x90 | n]))
        elif n <= 0xFFFF:
            out.append(b"\xdc" + struct.pack(">H", n))
        else:
            out.append(b"\xdd" + struct.pack(">I", n))
        for v in o:
            _pack_into(out, v)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(bytes([0x80 | n]))
        elif n <= 0xFFFF:
            out.append(b"\xde" + struct.pack(">H", n))
        else:
            out.append(b"\xdf" + struct.pack(">I", n))
        for k, v in o.items():
            _pack_into(out, k)
            _pack_into(out, v)
    else:
        raise TypeError(f"msgpack cannot pack {type(o).__name__}")


def msgpack_unpackb(buf: bytes):
    """Unpack exactly one object; trailing bytes are an error (a datum
    payload is one map, not a stream)."""
    o, pos = _unpack(memoryview(buf), 0)
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing bytes after object")
    return o


def iter_msgpack_stream(buf: bytes) -> Iterator[object]:
    """Yield successive top-level objects from a raw concatenation —
    the .pldata file layout. A truncated tail (crashed writer) raises:
    capture data must not silently lose the last datum."""
    mv = memoryview(buf)
    pos, n = 0, len(buf)
    while pos < n:
        o, pos = _unpack(mv, pos)
        yield o


def _unpack(buf: memoryview, pos: int):
    try:
        return _unpack_inner(buf, pos)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated msgpack data at byte {pos}") from exc


def _unpack_inner(buf: memoryview, pos: int):
    b = buf[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return _take_str(buf, pos, n)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:
        return _take_bin(buf, pos + 1, buf[pos])
    if b == 0xC5:
        return _take_bin(buf, pos + 2, struct.unpack_from(">H", buf, pos)[0])
    if b == 0xC6:
        return _take_bin(buf, pos + 4, struct.unpack_from(">I", buf, pos)[0])
    if b == 0xCA:
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if b == 0xCB:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if b == 0xCC:
        return buf[pos], pos + 1
    if b == 0xCD:
        return struct.unpack_from(">H", buf, pos)[0], pos + 2
    if b == 0xCE:
        return struct.unpack_from(">I", buf, pos)[0], pos + 4
    if b == 0xCF:
        return struct.unpack_from(">Q", buf, pos)[0], pos + 8
    if b == 0xD0:
        return struct.unpack_from("b", buf, pos)[0], pos + 1
    if b == 0xD1:
        return struct.unpack_from(">h", buf, pos)[0], pos + 2
    if b == 0xD2:
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if b == 0xD3:
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if b == 0xD9:
        return _take_str(buf, pos + 1, buf[pos])
    if b == 0xDA:
        return _take_str(buf, pos + 2, struct.unpack_from(">H", buf, pos)[0])
    if b == 0xDB:
        return _take_str(buf, pos + 4, struct.unpack_from(">I", buf, pos)[0])
    if b == 0xDC:
        return _unpack_array(
            buf, pos + 2, struct.unpack_from(">H", buf, pos)[0]
        )
    if b == 0xDD:
        return _unpack_array(
            buf, pos + 4, struct.unpack_from(">I", buf, pos)[0]
        )
    if b == 0xDE:
        return _unpack_map(
            buf, pos + 2, struct.unpack_from(">H", buf, pos)[0]
        )
    if b == 0xDF:
        return _unpack_map(
            buf, pos + 4, struct.unpack_from(">I", buf, pos)[0]
        )
    # 0xc1 is never used; 0xc7-0xc9 / 0xd4-0xd8 are ext types the
    # capture format never writes — reject rather than mis-decode.
    raise ValueError(f"unsupported msgpack type byte 0x{b:02x}")


def _take_str(buf: memoryview, pos: int, n: int):
    end = pos + n
    if end > len(buf):
        raise IndexError("str runs past buffer")
    return bytes(buf[pos:end]).decode("utf-8"), end


def _take_bin(buf: memoryview, pos: int, n: int):
    end = pos + n
    if end > len(buf):
        raise IndexError("bin runs past buffer")
    return bytes(buf[pos:end]), end


def _unpack_array(buf: memoryview, pos: int, n: int):
    items = []
    for _ in range(n):
        v, pos = _unpack_inner(buf, pos)
        items.append(v)
    return items, pos


def _unpack_map(buf: memoryview, pos: int, n: int):
    d = {}
    for _ in range(n):
        k, pos = _unpack_inner(buf, pos)
        v, pos = _unpack_inner(buf, pos)
        d[k] = v
    return d, pos


# ---------------------------------------------------------------------
# NPY v1/v2 parser (the public .npy container) for the sidecar.
# ---------------------------------------------------------------------


def parse_npy(buf: bytes):
    """Parse one .npy file's bytes into an ndarray — the executor-side
    twin of np.load for the timestamps sidecar (no temp files, no
    pickle path: object arrays are rejected)."""
    import numpy as np

    if buf[:6] != b"\x93NUMPY":
        raise ValueError("not an NPY file (bad magic)")
    major = buf[6]
    if major == 1:
        (hlen,) = struct.unpack_from("<H", buf, 8)
        off = 10
    elif major in (2, 3):
        (hlen,) = struct.unpack_from("<I", buf, 8)
        off = 12
    else:
        raise ValueError(f"unsupported NPY version {major}")
    header = ast.literal_eval(buf[off : off + hlen].decode("latin1"))
    descr, shape = header["descr"], header["shape"]
    if not isinstance(descr, str) or descr.endswith("O"):
        raise ValueError(f"refusing non-scalar NPY descr {descr!r}")
    dt = np.dtype(descr)
    count = 1
    for s in shape:
        count *= s
    arr = np.frombuffer(buf, dtype=dt, offset=off + hlen, count=count)
    order = "F" if header.get("fortran_order") else "C"
    return arr.reshape(shape, order=order)


# ---------------------------------------------------------------------
# pldata write twin + Spark reader.
# ---------------------------------------------------------------------


def _plain(o):
    """Reference ``ndarrray_to_list`` default (file_methods.py:96)
    generalized: numpy arrays/scalars → plain Python, recursively."""
    if hasattr(o, "tolist"):  # ndarray and numpy scalars
        return o.tolist()
    if isinstance(o, dict):
        return {k: _plain(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_plain(v) for v in o]
    return o


def write_pldata(directory: str, topic: str, datums, timestamps=None) -> str:
    """Driver-side twin of the reference PLData_Writer
    (file_methods.py:157): each datum appends
    ``packb((topic, packb(datum)))`` to ``<topic>.pldata``; close()
    saves the timestamp queue as ``<topic>_timestamps.npy``. Datum
    dicts carry their own ``timestamp`` (the writer's append() reads
    it) unless ``timestamps`` supplies the sidecar explicitly."""
    import numpy as np

    os.makedirs(directory, exist_ok=True)
    ts: list[float] = []
    with open(os.path.join(directory, topic + ".pldata"), "wb") as fh:
        for d in datums:
            d = _plain(d)
            if timestamps is None:
                ts.append(float(d["timestamp"]))
            payload = msgpack_packb(d)
            fh.write(msgpack_packb((d.get("topic", topic), payload)))
    arr = np.asarray(
        ts if timestamps is None else list(timestamps), dtype="float64"
    )
    np.save(os.path.join(directory, topic + "_timestamps.npy"), arr)
    return os.path.join(directory, topic + ".pldata")


# Default field specs: dotted path into the datum map -> Spark type.
# The pupil datum shape is the reference's plabs_detect_pupil output
# (pupil_detection_pl.py:120-131: confidence, diameter, ellipse
# {center, axes, angle}, norm_pos, luminance, id, timestamp).
PUPIL_FIELDS: dict[str, tuple[str, str]] = {
    "timestamp": ("timestamp", "double"),
    "confidence": ("confidence", "double"),
    "norm_pos_x": ("norm_pos.0", "double"),
    "norm_pos_y": ("norm_pos.1", "double"),
    "diameter": ("diameter", "double"),
    "luminance": ("luminance", "double"),
    "ellipse_center_x": ("ellipse.center.0", "double"),
    "ellipse_center_y": ("ellipse.center.1", "double"),
    "ellipse_axis_a": ("ellipse.axes.0", "double"),
    "ellipse_axis_b": ("ellipse.axes.1", "double"),
    "ellipse_angle": ("ellipse.angle", "double"),
    "eye_id": ("id", "bigint"),
}

# The gaze datum subset read_pl_gaze_csv also exposes (utils.py:12) —
# reading the binary capture gives the same columns as the CSV export.
GAZE_FIELDS: dict[str, tuple[str, str]] = {
    "timestamp": ("timestamp", "double"),
    "confidence": ("confidence", "double"),
    "norm_pos_x": ("norm_pos.0", "double"),
    "norm_pos_y": ("norm_pos.1", "double"),
}

# The odometry datum surface load_odometry reads (reference
# odometry.py:58 data_fields: tracker_confidence, position, orientation,
# linear/angular velocity, linear/angular acceleration — topic /
# timestamp / source_timestamp are popped as extraneous but timestamp
# stays the clock). ``orientation`` is a (w, x, y, z) quaternion: the
# reference unpacks it positionally into
# euler_from_quaternion(w, x, y, z) (odometry.py:97/:176).
ODOMETRY_FIELDS: dict[str, tuple[str, str]] = {
    "timestamp": ("timestamp", "double"),
    "tracker_confidence": ("tracker_confidence", "double"),
    "pos_x": ("position.0", "double"),
    "pos_y": ("position.1", "double"),
    "pos_z": ("position.2", "double"),
    "quat_w": ("orientation.0", "double"),
    "quat_x": ("orientation.1", "double"),
    "quat_y": ("orientation.2", "double"),
    "quat_z": ("orientation.3", "double"),
    "lin_vel_x": ("linear_velocity.0", "double"),
    "lin_vel_y": ("linear_velocity.1", "double"),
    "lin_vel_z": ("linear_velocity.2", "double"),
    "ang_vel_x": ("angular_velocity.0", "double"),
    "ang_vel_y": ("angular_velocity.1", "double"),
    "ang_vel_z": ("angular_velocity.2", "double"),
    "lin_acc_x": ("linear_acceleration.0", "double"),
    "lin_acc_y": ("linear_acceleration.1", "double"),
    "lin_acc_z": ("linear_acceleration.2", "double"),
    "ang_acc_x": ("angular_acceleration.0", "double"),
    "ang_acc_y": ("angular_acceleration.1", "double"),
    "ang_acc_z": ("angular_acceleration.2", "double"),
}


def _extract(datum, path: str):
    """Walk a dotted path ('ellipse.center.0') through nested
    maps/arrays; any missing step yields None (capture streams carry
    heterogeneous topics — absent fields are data, not errors)."""
    cur = datum
    for step in path.split("."):
        if isinstance(cur, dict):
            cur = cur.get(step)
        elif isinstance(cur, (list, tuple)):
            try:
                cur = cur[int(step)]
            except (ValueError, IndexError):
                return None
        else:
            return None
        if cur is None:
            return None
    return cur


_PANDAS_DTYPE = {"double": "Float64", "bigint": "Int64", "string": "object"}


def _glob_root(directory: str) -> str:
    """Static (wildcard-free) prefix of the recording glob, normalized
    with any URI scheme stripped. Recording identity is the capture
    dir's path RELATIVE to this root, so two recordings sharing a dir
    basename under a deeper glob (e.g. ``subjects/*/session1``) cannot
    collide on the (recording, idx) sidecar-join key."""
    from urllib.parse import urlparse

    static: list[str] = []
    for part in directory.rstrip("/").split("/"):
        if any(c in part for c in "*?[{"):
            break
        static.append(part)
    path = "/".join(static) or "/"
    parsed = urlparse(path)
    return os.path.normpath(parsed.path if parsed.scheme else path)


def _recording_id(fpath: str, root: str) -> str:
    """Identity of the recording that owns ``fpath``: its parent dir
    relative to the glob root (unique per recording by construction);
    falls back to the dir basename when the file sits AT the root
    (single-recording reads, where the basename is the natural name)."""
    from urllib.parse import urlparse

    parent = fpath.rstrip("/").rsplit("/", 1)[0]
    parsed = urlparse(parent)
    ppath = os.path.normpath(parsed.path if parsed.scheme else parent)
    rel = os.path.relpath(ppath, root)
    if rel == "." or rel.startswith(".."):
        return ppath.rsplit("/", 1)[-1]
    return rel


def _body_parser(fields, rows_per_batch: int, rec_root: str):
    """The shared datum-stream decode kernel: resolves the field spec,
    returns (fields, output DDL schema, mapInPandas closure). Both the
    batch reader and the streaming face run THIS closure, so streamed
    rows equal batch rows for the same files by construction."""
    fields = dict(PUPIL_FIELDS if fields is None else fields)
    reserved = {"recording", "idx", "topic", "capture_ts"}
    clash = reserved & set(fields)
    if clash:
        raise ValueError(f"field names clash with fixed columns: {clash}")
    body_schema = "recording string, idx bigint, topic string" + "".join(
        f", {c} {t}" for c, (_, t) in fields.items()
    )

    def parse_body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        specs = list(fields.items())

        def flush(rows):
            cols: dict[str, object] = {
                "recording": pd.Series(
                    [r[0] for r in rows], dtype="object"
                ),
                "idx": pd.Series([r[1] for r in rows], dtype="int64"),
                "topic": pd.Series([r[2] for r in rows], dtype="object"),
            }
            for j, (cname, (_, typ)) in enumerate(specs):
                cols[cname] = pd.array(
                    [r[3 + j] for r in rows],
                    dtype=_PANDAS_DTYPE.get(typ, "object"),
                )
            return pd.DataFrame(cols)

        for pdf in batches:
            rows: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rec = _recording_id(fpath, rec_root)
                for i, pair in enumerate(
                    iter_msgpack_stream(bytes(content))
                ):
                    if (
                        not isinstance(pair, list)
                        or len(pair) != 2
                        or not isinstance(pair[1], (bytes, bytearray))
                    ):
                        raise ValueError(
                            f"{fpath}: datum {i} is not a "
                            "(topic, payload) pair"
                        )
                    tpc, payload = pair
                    datum = msgpack_unpackb(bytes(payload))
                    vals = []
                    for _, (path, typ) in specs:
                        v = _extract(datum, path)
                        if v is not None:
                            if typ == "double":
                                v = float(v)
                            elif typ == "bigint":
                                v = int(v)
                            else:
                                v = str(v)
                        vals.append(v)
                    rows.append((rec, i, str(tpc), *vals))
                    if len(rows) >= rows_per_batch:
                        yield flush(rows)
                        rows = []
            if rows:
                yield flush(rows)

    return fields, body_schema, parse_body


def read_pldata(
    spark: SparkSession,
    directory: str,
    topic: str,
    fields: dict[str, tuple[str, str]] | None = None,
    rows_per_batch: int = 4096,
) -> DataFrame:
    """``load_pldata_file(directory, topic)`` as a Spark source:
    ``directory`` (a single recording dir or a glob over many, e.g.
    ``sessions/*/``) → one typed row per datum with columns
    (recording, idx, topic, capture_ts, *fields). ``capture_ts`` comes
    from the ``<topic>_timestamps.npy`` sidecar (the reference's
    ``data_ts``), left-joined on (recording, idx) so a missing sidecar
    degrades to nulls instead of dropping datums.

    Scale: one task per recording file; datum decode + field
    extraction is one Python pass per file emitting bounded Arrow
    batches of narrow typed columns. The sidecar table has the SAME
    row cardinality as the body (one clock entry per datum) so the
    join is a plain equi-join on the unique (recording, idx) key —
    both sides arrive partitioned by recording file, and AQE picks
    the strategy; never broadcast it. ``recording`` is the capture
    dir's path relative to the glob's static root (_recording_id), so
    deep globs with repeated dir basenames cannot collide."""
    rec_root = _glob_root(directory)
    fields, body_schema, parse_body = _body_parser(
        fields, rows_per_batch, rec_root
    )

    def parse_sidecar(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs: list[str] = []
            idxs: list[int] = []
            tss: list[float] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rec = _recording_id(fpath, rec_root)
                arr = parse_npy(bytes(content)).astype("float64").ravel()
                recs.extend([rec] * len(arr))
                idxs.extend(range(len(arr)))
                tss.extend(float(x) for x in arr)
            yield pd.DataFrame(
                {
                    "recording": pd.Series(recs, dtype="object"),
                    "idx": pd.Series(idxs, dtype="int64"),
                    "capture_ts": pd.Series(tss, dtype="float64"),
                }
            )

    def scan(glob: str) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            return (
                spark.read.format("binaryFile")
                .load(glob)
                .select("path", "content")
            )
        except AnalysisException as exc:
            # Match the typed errorClass (getCondition in PySpark 4,
            # getErrorClass before it) rather than locale-dependent
            # message wording; the message substrings stay as fallback
            # for builds that predate error classes.
            cond = ""
            for getter in ("getCondition", "getErrorClass"):
                fn = getattr(exc, getter, None)
                if callable(fn):
                    try:
                        cond = fn() or ""
                    except Exception:  # noqa: BLE001 — best-effort probe
                        cond = ""
                    if cond:
                        break
            if (
                "PATH_NOT_FOUND" in cond
                or "PATH_NOT_FOUND" in str(exc)
                or "Path does not exist" in str(exc)
            ):
                return None  # the reference's IOError -> empty contract
            raise

    out_schema = (
        "recording string, idx bigint, topic string, capture_ts double"
        + "".join(f", {c} {t}" for c, (_, t) in fields.items())
    )
    body_files = scan(os.path.join(directory, topic + ".pldata"))
    if body_files is None:
        return spark.createDataFrame([], schema=out_schema)
    body = body_files.mapInPandas(parse_body, schema=body_schema)
    side_files = scan(
        os.path.join(directory, topic + "_timestamps.npy")
    )
    if side_files is None:
        side = spark.createDataFrame(
            [], schema="recording string, idx bigint, capture_ts double"
        )
    else:
        side = side_files.mapInPandas(
            parse_sidecar,
            schema="recording string, idx bigint, capture_ts double",
        )
    return body.join(side, on=["recording", "idx"], how="left").select(
        "recording",
        "idx",
        "topic",
        "capture_ts",
        *[c for c in fields],
    )


# the binaryFile source's fixed schema (needed up front by readStream)
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_pldata(
    spark: SparkSession,
    directory: str,
    topic: str,
    fields: dict[str, tuple[str, str]] | None = None,
    rows_per_batch: int = 4096,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming capture ingest: `binaryFile` is a streaming-capable
    file source, so each newly-landed ``<topic>.pldata`` recording
    file becomes one task in the micro-batch that discovers it —
    decoded by the SAME kernel as the batch reader (shared closure),
    so streamed rows ≡ batch ``read_pldata`` rows for the same files
    by construction (minus ``capture_ts``: the sidecar join is a
    batch-side concern — the datum's own ``timestamp`` field carries
    the capture clock in Pupil captures, and a foreachBatch sink that
    needs the sidecar can run the batch reader per micro-batch).

    Scale: discovery cost is the file listing per trigger; decode
    parallelism is files-per-trigger, the same unit as batch. State:
    none — the map is stateless, so this composes with watermarked
    downstream operators (e.g. streaming_blinks over the confidence
    column) without extra bookkeeping."""
    fields, body_schema, parse_body = _body_parser(
        fields, rows_per_batch, _glob_root(directory)
    )
    reader = spark.readStream.format("binaryFile").schema(
        _BINARYFILE_SCHEMA
    )
    for k, v in (options or {}).items():  # e.g. maxFilesPerTrigger
        reader = reader.option(k, v)
    files = reader.load(
        os.path.join(directory, topic + ".pldata")
    ).select("path", "content")
    return files.mapInPandas(parse_body, schema=body_schema)


def _unflatten(pairs):
    """Inverse of ``_extract``: [(dotted path, value)] → nested datum.
    Integer path steps rebuild arrays (contiguous from 0 — the shipped
    field specs index pairs/triples), string steps rebuild maps."""
    root: dict = {}

    def node_for(nxt: str):
        return [] if nxt.isdigit() else {}

    for path, v in pairs:
        parts = path.split(".")
        cur = root
        for i, p in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if isinstance(cur, list):
                k = int(p)
                while len(cur) <= k:
                    cur.append(None)
                if cur[k] is None:
                    cur[k] = node_for(nxt)
                cur = cur[k]
            else:
                if p not in cur:
                    cur[p] = node_for(nxt)
                cur = cur[p]
        last = parts[-1]
        if isinstance(cur, list):
            k = int(last)
            while len(cur) <= k:
                cur.append(None)
            cur[k] = v
        else:
            cur[last] = v
    return root


def write_pldata_recordings(
    df: DataFrame,
    path: str,
    topic: str,
    fields: dict[str, tuple[str, str]] | None = None,
) -> str:
    """Distributed PLData_Writer (file_methods.py:157): pack typed rows
    back into per-recording ``<path>/<recording>/<topic>.pldata`` +
    timestamp sidecar — the exact inverse of ``read_pldata``, so
    detection outputs written here load in actual Pupil Labs tooling
    (and round-trip through read_pldata, pytest-pinned). One
    applyInPandas group per recording (bounded by construction: one
    capture file each), datums ordered by idx; the sidecar takes
    ``capture_ts`` when present, else the datum's own timestamp.

    Filesystem contract: files are written from EXECUTORS via plain
    ``open()`` — the write_tar_shards contract (shared filesystem /
    local mode); on executor-local disks route through the Hadoop
    FileSystem API instead (sources/writers.py pattern)."""
    fields = dict(PUPIL_FIELDS if fields is None else fields)
    os.makedirs(path, exist_ok=True)
    has_cts = "capture_ts" in df.columns

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx")
        rec = str(pdf["recording"].iloc[0])
        datums, ts = [], []
        for row in pdf.itertuples(index=False):
            pairs = []
            for cname, (p, typ) in fields.items():
                v = getattr(row, cname)
                if v is None or (isinstance(v, float) and v != v):
                    continue  # absent fields stay absent
                if typ == "double":
                    v = float(v)
                elif typ == "bigint":
                    v = int(v)
                else:
                    v = str(v)
                pairs.append((p, v))
            datum = _unflatten(pairs)
            datum["topic"] = str(row.topic)
            datums.append(datum)
            cts = getattr(row, "capture_ts", None) if has_cts else None
            if cts is not None and not (
                isinstance(cts, float) and cts != cts
            ):
                ts.append(float(cts))
            else:
                ts.append(float(datum.get("timestamp", 0.0)))
        write_pldata(
            os.path.join(path, rec), topic, datums, timestamps=ts
        )
        return pd.DataFrame(
            {"recording": [rec], "n_datums": [len(datums)]}
        )

    stats = df.groupBy("recording").applyInPandas(
        pack, "recording string, n_datums long"
    )
    stats.collect()  # materialize (stats is recordings-sized)
    return path
