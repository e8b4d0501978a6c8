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

import io
import json
import os
import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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
        if self.pos + n > len(self.data):
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


def _decode_value(rd: _Reader, schema) -> object:
    """Decode one value under the (parsed-JSON) writer schema."""
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
        return _decode_value(rd, schema[idx])
    t = schema["type"]
    if t == "record":
        return {
            f["name"]: _decode_value(rd, f["type"]) for f in schema["fields"]
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
                out.append(_decode_value(rd, schema["items"]))
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
                out[k] = _decode_value(rd, schema["values"])
        return out
    # named-type reference or wrapped primitive {"type": "string"}
    if isinstance(t, (str, list, dict)) and not schema.get("fields"):
        return _decode_value(rd, t)
    raise ValueError(f"avro: unsupported schema {schema!r}")


def decode_avro_file(payload: bytes):
    """OCF bytes → (writer schema (parsed JSON), list of decoded records).

    Verifies the magic and every block's sync marker; supports the ``null``
    and ``deflate`` codecs.  Raises ``ValueError`` on corruption (callers
    at the Spark layer turn that into diagnostic rows)."""
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
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")

    records: list = []
    while rd.pos < len(rd.data):
        n_records = rd.long()
        n_bytes = rd.long()
        block = rd.read(n_bytes)
        if rd.read(16) != sync:
            raise ValueError("avro: block sync mismatch")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        brd = _Reader(block)
        for _ in range(n_records):
            records.append(_decode_value(brd, schema))
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


def _encode_value(wr: _Writer, schema, value) -> None:
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
        # union: pick the first branch that matches the python value
        for idx, branch in enumerate(schema):
            if value is None and branch == "null":
                wr.long(idx)
                return
            if value is not None and branch != "null":
                wr.long(idx)
                _encode_value(wr, branch, value)
                return
        raise ValueError("avro: no union branch for value")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode_value(wr, f["type"], value[f["name"]])
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
                _encode_value(wr, schema["items"], v)
        wr.long(0)
    elif t == "map":
        if value:
            wr.long(len(value))
            for k, v in value.items():
                wr.bytes_(str(k).encode("utf-8"))
                _encode_value(wr, schema["values"], v)
        wr.long(0)
    else:
        _encode_value(wr, t, value)


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
    for start in range(0, len(records), records_per_block):
        chunk = records[start : start + records_per_block]
        body = _Writer()
        for rec in chunk:
            _encode_value(body, schema, rec)
        payload = bytes(body.buf)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw deflate
        head.long(len(chunk))
        head.long(len(payload))
        head.buf += payload
        head.buf += sync
    return bytes(head.buf)


# --- avro schema → Spark schema ---------------------------------------------


def _spark_type(schema):
    if isinstance(schema, str):
        return {
            "boolean": BooleanType(),
            "int": IntegerType(),
            "long": LongType(),
            "float": FloatType(),
            "double": DoubleType(),
            "bytes": BinaryType(),
            "string": StringType(),
            "null": StringType(),  # all-null column
        }[schema]
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise BuzzSchemaError(
                f"unsupported non-nullable avro union {schema!r}"
            )
        return _spark_type(branches[0])
    t = schema["type"]
    if t == "record":
        return StructType(
            [
                StructField(f["name"], _spark_type(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if t == "enum":
        return StringType()
    if t == "fixed":
        return BinaryType()
    if t == "array":
        return ArrayType(_spark_type(schema["items"]), True)
    if t == "map":
        return MapType(StringType(), _spark_type(schema["values"]), True)
    return _spark_type(t)


def avro_spark_schema(schema) -> StructType:
    """Top-level writer schema (must be a record) → Spark StructType."""
    st = _spark_type(schema)
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

    first = bin_df.orderBy("path").select("path", "content").limit(1).collect()
    if not first:
        raise BuzzBadRequestError(f"no .avro files under {path!r}")
    ref_schema, _ = decode_avro_file(bytes(first[0]["content"]))
    spark_schema = avro_spark_schema(ref_schema)
    out_schema = (
        StructType(spark_schema.fields + [StructField("_error", StringType(), True)])
        if diagnostics
        else spark_schema
    )
    field_names = [f.name for f in spark_schema.fields]

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in out_schema.fields]
        for batch in batches:
            rows = []
            for p, content in zip(batch["path"], batch["content"]):
                try:
                    _, records = decode_avro_file(bytes(content))
                    for rec in records:
                        if not isinstance(rec, dict):
                            raise ValueError("avro: top-level not a record")
                        row = {k: rec.get(k) for k in field_names}
                        if diagnostics:
                            row["_error"] = None
                        rows.append(row)
                except (ValueError, KeyError, zlib.error) as e:
                    if not diagnostics:
                        raise BuzzExecutionError(f"avro file {p}: {e}") from e
                    row = {k: None for k in field_names}
                    row["_error"] = f"{os.path.basename(str(p))}: {e}"
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return bin_df.mapInPandas(decode, schema=out_schema)
