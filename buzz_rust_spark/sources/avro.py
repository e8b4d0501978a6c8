"""Avro Object Container File source — pure-python, schema-driven.

Avro is the remaining row-oriented container that actually shows up in
corpus work: dataset dumps, Kafka archive topics, and (the follow-on use)
Iceberg's manifest files are all Avro OCF.  Spark ships an avro module as an
EXTERNAL package (``spark-avro``), absent from this container — so like the
WARC/WebDataset/media codecs, the format support here is self-contained:

- ``read_avro(spark, paths)`` — distributed read: one binaryFile row per
  ``.avro`` file (file = task, no shuffle — the same shard-parallel shape as
  ``sources/warc.py``), each worker decoding its file's blocks with the
  schema EMBEDDED in that file's header (OCF files are self-describing).
  The Spark schema is derived driver-side from the first file's writer
  schema; files whose schema disagrees produce a per-file diagnostic row
  option rather than a stage failure.
- ``decode_avro_file(payload)`` — the core codec: container magic, file
  metadata (``avro.schema``, ``avro.codec``), sync-marker-verified blocks
  (``null``, ``deflate``, and ``snappy`` codecs — snappy via a pure-python
  block-format decoder with the Avro CRC32 frame check), and the full
  binary encoding: zigzag varints, length-prefixed bytes/strings, IEEE
  float/double, enums, fixed, arrays/maps with negative-count size blocks,
  unions, nested records.
- ``encode_avro_records(schema_json, records)`` — the writer used for
  fixtures and round-trip proofs (null/deflate/snappy codecs), making the
  tests self-verifying the same way the FLAC codec's lossless round-trip
  is.
- Files larger than ``split_bytes`` split into sync-marker-aligned byte
  ranges, one task per range (Hadoop's input-split contract), so a single
  huge dump file still parallelizes.

Scope note: logical types (decimal/timestamp annotations) surface as their
underlying primitive; schema resolution (reader != writer schema) is out of
scope — each file decodes under its own writer schema.
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..errors import BuzzBadRequestError, BuzzExecutionError, BuzzSchemaError

_MAGIC = b"Obj\x01"


# --- snappy block format (pure python) ---------------------------------------
#
# Snappy is the de-facto default Avro codec in the wild; the raw block
# format (format_description.txt in google/snappy) is a varint uncompressed
# length followed by literal/copy elements.  Avro frames each compressed
# block with a 4-byte BIG-endian CRC32 of the UNCOMPRESSED bytes.


def _snappy_decompress(data: bytes) -> bytes:
    """Raw snappy block → bytes; ValueError on any malformation (a corrupt
    shard must produce a diagnostic row, never a hung or crashed task)."""
    n = 0
    shift = 0
    pos = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated length varint")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                extra = ln - 60
                if pos + extra > len(data):
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little") + 1
                pos += extra
            if pos + ln > len(data):
                raise ValueError("snappy: truncated literal")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 7) + 4
            if pos + 1 > len(data):
                raise ValueError("snappy: truncated copy")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte little-endian offset
            ln = (tag >> 2) + 1
            if pos + 2 > len(data):
                raise ValueError("snappy: truncated copy")
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte little-endian offset
            ln = (tag >> 2) + 1
            if pos + 4 > len(data):
                raise ValueError("snappy: truncated copy")
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        # byte-at-a-time on purpose: offsets < length overlap (RLE)
        for _ in range(ln):
            out.append(out[-off])
    if len(out) != n:
        raise ValueError(f"snappy: declared {n} bytes, produced {len(out)}")
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    """Valid (all-literal) snappy stream — no match-finding, so output is
    uncompressed-size + framing; used by the fixture writer and round-trip
    proofs, and decodable by any conformant snappy reader."""
    out = bytearray()
    v = len(data)
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break
    i = 0
    while i < len(data):
        chunk = data[i : i + 65536]
        ln = len(chunk)
        if ln <= 60:
            out.append((ln - 1) << 2)
        else:
            out.append(61 << 2)  # literal, 2-byte length form
            out += (ln - 1).to_bytes(2, "little")
        out += chunk
        i += ln
    return bytes(out)


_CODECS = ("null", "deflate", "snappy")


# --- binary decoding ---------------------------------------------------------


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.data):
            raise ValueError("avro: truncated input")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        """Zigzag varint (the int/long wire format)."""
        shift = 0
        acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("avro: varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        n = self.long()
        if n < 0:
            raise ValueError("avro: negative length")
        return self.read(n)


_PRIMITIVES = ("null", "boolean", "int", "long", "float", "double", "bytes", "string")


def _collect_names(schema, names: dict) -> None:
    """Register named types (record/enum/fixed) so later bare-string
    references — routine in real Avro, incl. Iceberg manifests — resolve.
    Namespacing is flattened to the bare name (documented scope)."""
    if isinstance(schema, list):
        for b in schema:
            _collect_names(b, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed") and "name" in schema:
        names[schema["name"]] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _collect_names(f["type"], names)
    elif t == "array":
        _collect_names(schema.get("items"), names)
    elif t == "map":
        _collect_names(schema.get("values"), names)
    elif isinstance(t, (dict, list)):
        _collect_names(t, names)


def _resolve(schema, names: dict | None):
    """Bare-string named-type reference → its definition (if registered)."""
    if (
        isinstance(schema, str)
        and schema not in _PRIMITIVES
        and names
        and schema in names
    ):
        return names[schema]
    return schema


def _decode_value(rd: _Reader, schema, names: dict | None = None) -> object:
    """Decode one value under the (parsed-JSON) writer schema."""
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return rd.read(1)[0] != 0
        if t in ("int", "long"):
            return rd.long()
        if t == "float":
            return struct.unpack("<f", rd.read(4))[0]
        if t == "double":
            return struct.unpack("<d", rd.read(8))[0]
        if t == "bytes":
            return rd.bytes_()
        if t == "string":
            return rd.bytes_().decode("utf-8")
        raise ValueError(f"avro: unknown primitive {t!r}")
    if isinstance(schema, list):  # union: long index + value
        idx = rd.long()
        if not 0 <= idx < len(schema):
            raise ValueError("avro: union index out of range")
        return _decode_value(rd, schema[idx], names)
    t = schema["type"]
    if t == "record":
        return {
            f["name"]: _decode_value(rd, f["type"], names)
            for f in schema["fields"]
        }
    if t == "enum":
        idx = rd.long()
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError("avro: enum index out of range")
        return symbols[idx]
    if t == "fixed":
        return rd.read(int(schema["size"]))
    if t == "array":
        out = []
        while True:
            count = rd.long()
            if count == 0:
                break
            if count < 0:  # block size follows (skippable form)
                rd.long()
                count = -count
            for _ in range(count):
                out.append(_decode_value(rd, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            count = rd.long()
            if count == 0:
                break
            if count < 0:
                rd.long()
                count = -count
            for _ in range(count):
                k = rd.bytes_().decode("utf-8")
                out[k] = _decode_value(rd, schema["values"], names)
        return out
    # wrapped form {"type": <schema>} (e.g. {"type": "string"})
    if isinstance(t, (str, list, dict)) and not schema.get("fields"):
        return _decode_value(rd, t, names)
    raise ValueError(f"avro: unsupported schema {schema!r}")


def _read_header(payload: bytes):
    """Magic + file metadata + sync → (schema, codec, sync, body offset).

    Cheap: touches only the header region — schema derivation over a big
    corpus must not decode (or even inflate) anyone's record blocks."""
    rd = _Reader(payload)
    if rd.read(4) != _MAGIC:
        raise ValueError("avro: bad magic")
    meta: dict[str, bytes] = {}
    while True:
        count = rd.long()
        if count == 0:
            break
        if count < 0:
            rd.long()
            count = -count
        for _ in range(count):
            k = rd.bytes_().decode("utf-8")
            meta[k] = rd.bytes_()
    sync = rd.read(16)
    if "avro.schema" not in meta:
        raise ValueError("avro: header missing avro.schema")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in _CODECS:
        raise ValueError(f"avro: unsupported codec {codec!r}")
    return schema, codec, sync, rd.pos


def _inflate_block(block: bytes, codec: str) -> bytes:
    """Compressed block bytes → record bytes for any supported codec."""
    if codec == "deflate":
        return zlib.decompress(block, -15)
    if codec == "snappy":
        if len(block) < 4:
            raise ValueError("avro: snappy block shorter than its CRC")
        data = _snappy_decompress(block[:-4])
        want = int.from_bytes(block[-4:], "big")
        if zlib.crc32(data) & 0xFFFFFFFF != want:
            raise ValueError("avro: snappy block CRC mismatch")
        return data
    return block


def decode_avro_file(payload: bytes):
    """OCF bytes → (writer schema (parsed JSON), list of decoded records).

    Verifies the magic and every block's sync marker; supports the ``null``
    and ``deflate`` codecs.  Raises ``ValueError`` on corruption (callers
    at the Spark layer turn that into diagnostic rows)."""
    schema, codec, sync, pos = _read_header(payload)
    rd = _Reader(payload, pos)
    names: dict = {}
    _collect_names(schema, names)

    records: list = []
    while rd.pos < len(rd.data):
        n_records = rd.long()
        n_bytes = rd.long()
        if n_records < 0 or n_bytes < 0:
            # a negative byte count would make _Reader.read move BACKWARD
            # and loop forever — corruption must raise, never hang a task
            raise ValueError("avro: negative block count")
        block = rd.read(n_bytes)
        if rd.read(16) != sync:
            raise ValueError("avro: block sync mismatch")
        block = _inflate_block(block, codec)
        brd = _Reader(block)
        for _ in range(n_records):
            records.append(_decode_value(brd, schema, names))
        if brd.pos != len(block):
            raise ValueError("avro: trailing bytes in block")
    return schema, records


# --- binary encoding (fixtures / round-trip proofs) --------------------------


class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()

    def long(self, v: int) -> None:
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                self.buf.append(b | 0x80)
            else:
                self.buf.append(b)
                break

    def bytes_(self, b: bytes) -> None:
        self.long(len(b))
        self.buf += b


def _union_matches(branch, value, names: dict | None) -> bool:
    """Does ``value`` belong to this union branch?  (Type-directed — the
    positional first-non-null rule silently coerces, e.g. '5' → int 5.)"""
    branch = _resolve(branch, names)
    if branch == "null":
        return value is None
    if value is None:
        return False
    if isinstance(branch, str):
        if branch == "boolean":
            return isinstance(value, bool)
        if branch in ("int", "long"):
            return isinstance(value, int) and not isinstance(value, bool)
        if branch in ("float", "double"):
            return isinstance(value, (int, float)) and not isinstance(value, bool)
        if branch == "string":
            return isinstance(value, str)
        if branch == "bytes":
            return isinstance(value, (bytes, bytearray))
        return False
    t = branch.get("type")
    if t == "record":
        return isinstance(value, dict)
    if t == "enum":
        return isinstance(value, str) and value in branch.get("symbols", [])
    if t == "fixed":
        return isinstance(value, (bytes, bytearray)) and len(value) == int(
            branch["size"]
        )
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    return False


def _encode_value(wr: _Writer, schema, value, names: dict | None = None) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            wr.buf.append(1 if value else 0)
        elif t in ("int", "long"):
            wr.long(int(value))
        elif t == "float":
            wr.buf += struct.pack("<f", float(value))
        elif t == "double":
            wr.buf += struct.pack("<d", float(value))
        elif t == "bytes":
            wr.bytes_(bytes(value))
        elif t == "string":
            wr.bytes_(str(value).encode("utf-8"))
        else:
            raise ValueError(f"avro: unknown primitive {t!r}")
        return
    if isinstance(schema, list):
        # union: exact-type branches win over promoting ones across the
        # WHOLE union — under ['double','int'] an int must take the int
        # branch, not silently round-trip as float via schema-order
        # first-match (the promoting int→float/double match stays as the
        # fallback for unions with no integer branch)
        def _exact(branch) -> bool:
            b = _resolve(branch, names)
            if not isinstance(b, str):
                return False
            if isinstance(value, bool):
                return b == "boolean"
            if isinstance(value, int):
                return b in ("int", "long")
            if isinstance(value, float):
                return b in ("float", "double")
            return False

        for pred in (_exact, lambda br: _union_matches(br, value, names)):
            for idx, branch in enumerate(schema):
                if pred(branch):
                    wr.long(idx)
                    _encode_value(wr, branch, value, names)
                    return
        raise ValueError(
            f"avro: no union branch in {schema!r} for {type(value).__name__}"
        )
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode_value(wr, f["type"], value[f["name"]], names)
    elif t == "enum":
        wr.long(schema["symbols"].index(value))
    elif t == "fixed":
        if len(value) != int(schema["size"]):
            raise ValueError("avro: fixed size mismatch")
        wr.buf += bytes(value)
    elif t == "array":
        if value:
            wr.long(len(value))
            for v in value:
                _encode_value(wr, schema["items"], v, names)
        wr.long(0)
    elif t == "map":
        if value:
            wr.long(len(value))
            for k, v in value.items():
                wr.bytes_(str(k).encode("utf-8"))
                _encode_value(wr, schema["values"], v, names)
        wr.long(0)
    else:
        _encode_value(wr, t, value, names)


def encode_avro_records(
    schema_json: str | dict,
    records: list,
    codec: str = "null",
    records_per_block: int = 1000,
    metadata: dict[str, str] | None = None,
) -> bytes:
    """Records → OCF bytes under ``schema_json`` (``null``/``deflate``/
    ``snappy``).  ``metadata`` adds extra file-header key/value pairs —
    Iceberg manifests require ``schema``/``partition-spec``/etc. keys that
    Java readers consult before decoding a single record."""
    schema = (
        json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    )
    if codec not in _CODECS:
        raise BuzzBadRequestError(f"unsupported avro codec {codec!r}")
    extra = dict(metadata or {})
    if any(str(k).startswith("avro.") for k in extra):
        raise BuzzBadRequestError(
            "avro.* header keys are reserved (set schema/codec via the "
            "dedicated parameters)"
        )
    # deterministic sync marker from the schema (fixtures must be stable)
    import hashlib

    sync = hashlib.md5(json.dumps(schema, sort_keys=True).encode()).digest()
    head = _Writer()
    head.buf += _MAGIC
    head.long(2 + len(extra))
    head.bytes_(b"avro.schema")
    head.bytes_(json.dumps(schema).encode("utf-8"))
    head.bytes_(b"avro.codec")
    head.bytes_(codec.encode())
    for k, v in sorted(extra.items()):
        head.bytes_(str(k).encode("utf-8"))
        head.bytes_(str(v).encode("utf-8"))
    head.long(0)
    head.buf += sync
    names: dict = {}
    _collect_names(schema, names)
    for start in range(0, len(records), records_per_block):
        chunk = records[start : start + records_per_block]
        body = _Writer()
        for rec in chunk:
            _encode_value(body, schema, rec, names)
        payload = bytes(body.buf)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw deflate
        elif codec == "snappy":
            payload = _snappy_compress(payload) + (
                zlib.crc32(payload) & 0xFFFFFFFF
            ).to_bytes(4, "big")
        head.long(len(chunk))
        head.long(len(payload))
        head.buf += payload
        head.buf += sync
    return bytes(head.buf)


# --- avro schema → Spark schema ---------------------------------------------


def _spark_type(schema, names: dict | None = None):
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        prim = {
            "boolean": BooleanType(),
            "int": IntegerType(),
            "long": LongType(),
            "float": FloatType(),
            "double": DoubleType(),
            "bytes": BinaryType(),
            "string": StringType(),
            "null": StringType(),  # all-null column
        }.get(schema)
        if prim is None:
            raise BuzzSchemaError(
                f"unresolved avro type reference {schema!r}"
            )
        return prim
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise BuzzSchemaError(
                f"unsupported non-nullable avro union {schema!r}"
            )
        return _spark_type(branches[0], names)
    t = schema["type"]
    if t == "record":
        return StructType(
            [
                StructField(f["name"], _spark_type(f["type"], names), True)
                for f in schema["fields"]
            ]
        )
    if t == "enum":
        return StringType()
    if t == "fixed":
        return BinaryType()
    if t == "array":
        return ArrayType(_spark_type(schema["items"], names), True)
    if t == "map":
        return MapType(StringType(), _spark_type(schema["values"], names), True)
    return _spark_type(t, names)


def avro_spark_schema(schema) -> StructType:
    """Top-level writer schema (must be a record) → Spark StructType."""
    names: dict = {}
    _collect_names(schema, names)
    st = _spark_type(schema, names)
    if not isinstance(st, StructType):
        raise BuzzSchemaError("top-level avro schema must be a record")
    return st


# --- sync-marker range reads (block splitting) -------------------------------


def _header_from_file(fh, file_size: int):
    """Parse the OCF header by reading a growing prefix — never the whole
    file (the header is bounded by the embedded schema's size)."""
    prefix = 1 << 16
    while True:
        fh.seek(0)
        head = fh.read(min(prefix, file_size))
        try:
            return _read_header(head)
        except ValueError:
            if prefix >= file_size or prefix >= (64 << 20):
                raise
            prefix *= 2


def _records_in_range(path: str, start: int, end: int):
    """Decode the records of every block STARTING in ``[start, end)`` of a
    local OCF file — the Hadoop input-split contract: each split owns the
    blocks that begin inside it, following its last block past ``end`` if
    needed, so consecutive splits partition the file's records exactly.

    Block starts are found by scanning for the file's 16-byte sync marker.
    A marker-shaped byte run INSIDE block data is a possible (2^-128-ish)
    false positive; candidates that fail to decode to a sync-terminated
    block are discarded and the scan resumes at the next candidate, so a
    false positive costs retries, never wrong records.  Yields
    ``(schema, records)`` per decoded block."""
    size = os.path.getsize(path)
    end = min(end, size)
    with open(path, "rb") as fh:
        schema, codec, sync, body = _header_from_file(fh, size)
        names: dict = {}
        _collect_names(schema, names)

        candidates: list[int] = []
        if start <= body < end:
            candidates.append(body)
        # a block starting at b>body is preceded by a sync at b-16
        lo = max(body, start - 16)
        if lo < end:
            fh.seek(lo)
            window = fh.read((end - lo) + 16)
            at = window.find(sync)
            while at != -1:
                b = lo + at + 16
                if start <= b < end and b != body:
                    candidates.append(b)
                at = window.find(sync, at + 1)
        candidates.sort()

        def read_block(b: int):
            """(records, next_block_start) or None if b is not a real
            block boundary."""
            fh.seek(b)
            head = fh.read(20)  # two varints, ≤10 bytes each
            rd = _Reader(head)
            try:
                n_records = rd.long()
                n_bytes = rd.long()
            except ValueError:
                return None
            if n_records < 0 or n_bytes < 0 or b + rd.pos + n_bytes + 16 > size:
                return None
            fh.seek(b + rd.pos)
            block = fh.read(n_bytes)
            if fh.read(16) != sync:
                return None
            try:
                block = _inflate_block(block, codec)
                brd = _Reader(block)
                records = [
                    _decode_value(brd, schema, names) for _ in range(n_records)
                ]
                if brd.pos != len(block):
                    return None
            except (ValueError, zlib.error):
                return None
            return records, b + rd.pos + n_bytes + 16

        i = 0
        pos = None
        while i < len(candidates) or (pos is not None and pos < end):
            b = pos if pos is not None and pos < end else None
            if b is None:
                b = candidates[i]
                i += 1
                if pos is not None and b < pos:
                    continue  # a sync hit inside an already-decoded block
            got = read_block(b)
            if got is None:
                if pos is not None and b == pos:
                    raise ValueError(
                        f"avro: corrupt block chain at offset {b} of {path}"
                    )
                continue  # false-positive sync; try the next candidate
            records, pos = got
            yield schema, records
        if pos is None and start <= body < end and size > body:
            # the range contained the body start yet nothing decoded
            raise ValueError(f"avro: no decodable block at offset {body}")


def _local_path(p: str) -> str | None:
    """binaryFile path URI → local filesystem path, or None when the file
    is on a store the range reader cannot open directly (those files stay
    whole-file tasks; on a real cluster the range read would go through the
    object store's ranged GET instead)."""
    if p.startswith("file:"):
        rest = p[len("file:"):]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    if ":" not in p.split("/", 1)[0]:
        return p
    return None


# --- distributed read --------------------------------------------------------


def read_avro(
    spark: SparkSession,
    path: str | list[str],
    diagnostics: bool = False,
    split_bytes: int | None = None,
) -> DataFrame:
    """Distributed OCF read: ``path`` (file, directory, or glob — anything
    ``binaryFile`` accepts) → DataFrame in the schema embedded in the FIRST
    file (by path order).

    Scale shape: file = task (binaryFile + mapInPandas), no shuffle; each
    worker decodes only its own file using that file's embedded schema.
    Files LARGER than ``split_bytes`` (default 128 MiB) additionally split
    into sync-marker-aligned byte ranges, one task per range, so one huge
    .avro dump is not one task — the Hadoop input-split contract (each
    range owns the blocks starting inside it).  Range reads need direct
    file access; non-local stores fall back to whole-file tasks.  Files
    whose record shape disagrees with the reference schema, or that
    are corrupt, fail their task with a typed error — unless
    ``diagnostics=True``, which instead emits their rows as nulls alongside
    a ``_error`` column (corrupt shards must not kill a 100k-file intake)."""
    paths = path if isinstance(path, list) else [path]
    binf = spark.read.format("binaryFile").option("pathGlobFilter", "*.avro")
    split_bytes = (128 << 20) if split_bytes is None else int(split_bytes)

    # One path+length listing drives schema derivation AND split planning
    # (binaryFile prunes the content column for both).
    listing = (
        binf.load(paths).select("path", "length").orderBy("path").collect()
    )
    all_paths = [r["path"] for r in listing]
    if not all_paths:
        raise BuzzBadRequestError(f"no .avro files under {path!r}")
    # Schema derivation: fetch ONLY the winning path's bytes (then parse
    # just the header: no record decode, no inflate, no second full-corpus
    # read).  With diagnostics on, corrupt leading files are skipped until
    # a parsable header is found — a bad lexicographic-first shard must not
    # kill a 100k-file intake.
    ref_schema = None
    for candidate in all_paths:
        content = bytes(
            spark.read.format("binaryFile").load(candidate).head()["content"]
        )
        try:
            ref_schema, _, _, _ = _read_header(content)
            break
        except (ValueError, KeyError) as e:
            if not diagnostics:
                raise BuzzExecutionError(f"avro file {candidate}: {e}") from e
    if ref_schema is None:
        raise BuzzBadRequestError(
            f"no parsable .avro header under {path!r} ({len(all_paths)} files)"
        )
    spark_schema = avro_spark_schema(ref_schema)
    out_schema = (
        StructType(spark_schema.fields + [StructField("_error", StringType(), True)])
        if diagnostics
        else spark_schema
    )
    field_names = [f.name for f in spark_schema.fields]
    ref_schema_str = spark_schema.simpleString()

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in out_schema.fields]
        for batch in batches:
            rows = []
            for p, content in zip(batch["path"], batch["content"]):
                try:
                    schema, records = decode_avro_file(bytes(content))
                    # a file whose embedded schema disagrees must be a typed
                    # error (or a diagnostic row), never silently-null columns
                    got = avro_spark_schema(schema).simpleString()
                    if got != ref_schema_str:
                        raise ValueError(
                            f"avro: schema mismatch vs reference: {got}"
                        )
                    for rec in records:
                        if not isinstance(rec, dict):
                            raise ValueError("avro: top-level not a record")
                        row = {k: rec.get(k) for k in field_names}
                        if diagnostics:
                            row["_error"] = None
                        rows.append(row)
                except (ValueError, KeyError, zlib.error, BuzzSchemaError) as e:
                    if not diagnostics:
                        raise BuzzExecutionError(f"avro file {p}: {e}") from e
                    row = {k: None for k in field_names}
                    row["_error"] = f"{os.path.basename(str(p))}: {e}"
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    # split planning: big local files become byte ranges (one task each),
    # everything else stays a whole-file binaryFile task
    ranges: list[tuple[str, int, int, str]] = []
    whole: list[str] = []
    for r in listing:
        lp = _local_path(r["path"])
        if split_bytes and r["length"] > split_bytes and lp is not None:
            k = 0
            while k * split_bytes < r["length"]:
                ranges.append(
                    (
                        lp,
                        k * split_bytes,
                        min((k + 1) * split_bytes, r["length"]),
                        r["path"],
                    )
                )
                k += 1
        else:
            whole.append(r["path"])

    def decode_ranges(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in out_schema.fields]
        for batch in batches:
            rows = []
            for lp, s, e, p in zip(
                batch["lpath"], batch["start"], batch["end"], batch["path"]
            ):
                try:
                    checked = False
                    for schema, records in _records_in_range(
                        str(lp), int(s), int(e)
                    ):
                        if not checked:
                            got = avro_spark_schema(schema).simpleString()
                            if got != ref_schema_str:
                                raise ValueError(
                                    "avro: schema mismatch vs reference: "
                                    f"{got}"
                                )
                            checked = True
                        for rec in records:
                            if not isinstance(rec, dict):
                                raise ValueError("avro: top-level not a record")
                            row = {k: rec.get(k) for k in field_names}
                            if diagnostics:
                                row["_error"] = None
                            rows.append(row)
                except (
                    ValueError,
                    KeyError,
                    OSError,
                    zlib.error,
                    BuzzSchemaError,
                ) as e:
                    if not diagnostics:
                        raise BuzzExecutionError(
                            f"avro file {p} range [{s},{e}): {e}"
                        ) from e
                    row = {k: None for k in field_names}
                    row["_error"] = f"{os.path.basename(str(p))}[{s}:{e}]: {e}"
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    parts: list[DataFrame] = []
    if whole:
        bin_df = (
            spark.read.format("binaryFile").load(whole).select("path", "content")
        )
        parts.append(bin_df.mapInPandas(decode, schema=out_schema))
    if ranges:
        range_df = spark.createDataFrame(
            ranges, "lpath string, start long, end long, path string"
        ).repartition(len(ranges))
        parts.append(range_df.mapInPandas(decode_ranges, schema=out_schema))
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out
