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
  (``null`` and ``deflate`` codecs), and the full binary encoding: zigzag
  varints, length-prefixed bytes/strings, IEEE float/double, enums, fixed,
  arrays/maps with negative-count size blocks, unions, nested records.
- ``encode_avro_records(schema_json, records)`` — the writer used for
  fixtures and round-trip proofs (null/deflate codecs), making the tests
  self-verifying the same way the FLAC codec's lossless round-trip is.

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
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    return schema, codec, sync, rd.pos


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
        if codec == "deflate":
            block = zlib.decompress(block, -15)
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
) -> bytes:
    """Records → OCF bytes under ``schema_json`` (``null``/``deflate``)."""
    schema = (
        json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    )
    if codec not in ("null", "deflate"):
        raise BuzzBadRequestError(f"unsupported avro codec {codec!r}")
    # deterministic sync marker from the schema (fixtures must be stable)
    import hashlib

    sync = hashlib.md5(json.dumps(schema, sort_keys=True).encode()).digest()
    head = _Writer()
    head.buf += _MAGIC
    head.long(2)
    head.bytes_(b"avro.schema")
    head.bytes_(json.dumps(schema).encode("utf-8"))
    head.bytes_(b"avro.codec")
    head.bytes_(codec.encode())
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


# --- distributed read --------------------------------------------------------


def read_avro(
    spark: SparkSession,
    path: str | list[str],
    diagnostics: bool = False,
) -> DataFrame:
    """Distributed OCF read: ``path`` (file, directory, or glob — anything
    ``binaryFile`` accepts) → DataFrame in the schema embedded in the FIRST
    file (by path order).

    Scale shape: file = task (binaryFile + mapInPandas), no shuffle; each
    worker decodes only its own file using that file's embedded schema.
    Files whose record shape disagrees with the reference schema, or that
    are corrupt, fail their task with a typed error — unless
    ``diagnostics=True``, which instead emits their rows as nulls alongside
    a ``_error`` column (corrupt shards must not kill a 100k-file intake)."""
    paths = path if isinstance(path, list) else [path]
    binf = spark.read.format("binaryFile").option("pathGlobFilter", "*.avro")
    bin_df = binf.load(paths).select("path", "content")

    # Schema derivation: fetch ONLY the winning path's bytes (a path-only
    # TakeOrdered — binaryFile prunes the content column — then one
    # single-file load), and parse just the header: no record decode, no
    # inflate, no second full-corpus read.  With diagnostics on, corrupt
    # leading files are skipped until a parsable header is found — a bad
    # lexicographic-first shard must not kill a 100k-file intake.
    all_paths = [
        r["path"] for r in binf.load(paths).select("path").orderBy("path").collect()
    ]
    if not all_paths:
        raise BuzzBadRequestError(f"no .avro files under {path!r}")
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

    return bin_df.mapInPandas(decode, schema=out_schema)
