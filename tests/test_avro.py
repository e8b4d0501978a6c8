"""Avro Object Container File source (sources/avro.py)."""

from __future__ import annotations

import json

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark.errors import (
    BuzzBadRequestError,
    BuzzExecutionError,
    BuzzSchemaError,
)
from buzz_rust_spark.sources.avro import (
    avro_spark_schema,
    decode_avro_file,
    encode_avro_records,
    read_avro,
)

SCHEMA = {
    "type": "record", "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "meta", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "k", "symbols": ["a", "b"]}},
        {"name": "blob", "type": "bytes"},
        {"name": "ok", "type": "boolean"},
    ],
}


def _recs(n, start=0):
    return [
        {
            "doc_id": start + i,
            "text": None if i % 3 == 0 else f"text {start + i} é✓",
            "score": i * 1.5,
            "tags": [f"t{j}" for j in range(i % 4)],
            "meta": {"a": i, "b": -i},
            "kind": "a" if i % 2 else "b",
            "blob": bytes([i % 256, 255]),
            "ok": i % 2 == 0,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_codec_roundtrip_all_types(codec):
    recs = _recs(500)
    payload = encode_avro_records(SCHEMA, recs, codec=codec, records_per_block=64)
    schema, back = decode_avro_file(payload)
    assert schema["name"] == "doc"
    assert back == recs
    if codec == "deflate":
        null_len = len(encode_avro_records(SCHEMA, recs, codec="null"))
        assert len(payload) < null_len


def test_negative_count_array_blocks_and_nested_records():
    """The skippable (negative-count + byte-size) array block form and a
    nested record, hand-encoded, decode correctly."""
    from buzz_rust_spark.sources.avro import _Reader, _Writer, _decode_value

    inner = {"type": "record", "name": "pt",
             "fields": [{"name": "x", "type": "int"}, {"name": "y", "type": "int"}]}
    schema = {"type": "record", "name": "row",
              "fields": [{"name": "pts", "type": {"type": "array", "items": inner}}]}
    body = _Writer()
    items = _Writer()
    for x, y in ((1, 2), (3, 4)):
        items.long(x); items.long(y)
    body.long(-2)                 # negative count → size follows
    body.long(len(items.buf))
    body.buf += items.buf
    body.long(0)
    out = _decode_value(_Reader(bytes(body.buf)), schema)
    assert out == {"pts": [{"x": 1, "y": 2}, {"x": 3, "y": 4}]}


def test_corruption_detected():
    payload = bytearray(encode_avro_records(SCHEMA, _recs(5)))
    payload[-3] ^= 0xFF
    with pytest.raises(ValueError):
        decode_avro_file(bytes(payload))
    with pytest.raises(ValueError):
        decode_avro_file(b"NotAvroAtAll")


def test_spark_schema_mapping():
    st = avro_spark_schema(SCHEMA)
    kinds = {f.name: f.dataType.simpleString() for f in st.fields}
    assert kinds == {
        "doc_id": "bigint", "text": "string", "score": "double",
        "tags": "array<string>", "meta": "map<string,bigint>",
        "kind": "string", "blob": "binary", "ok": "boolean",
    }
    with pytest.raises(BuzzSchemaError):
        avro_spark_schema("long")
    with pytest.raises(BuzzSchemaError):
        avro_spark_schema(["int", "string"])  # non-nullable union


def test_read_avro_distributed(spark, tmp_path):
    """file = task: three shards (mixed codecs) → one DataFrame in the
    embedded schema, all rows present, complex columns intact."""
    d = tmp_path / "avro_in"
    d.mkdir()
    for i, codec in enumerate(["null", "deflate", "snappy"]):
        (d / f"part-{i}.avro").write_bytes(
            encode_avro_records(SCHEMA, _recs(40, start=i * 100), codec=codec)
        )
    df = read_avro(spark, str(d))
    assert df.count() == 120
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[101]["text"] == "text 101 é✓"
    assert rows[0]["text"] is None
    assert list(rows[3]["tags"]) == ["t0", "t1", "t2"]
    assert rows[202]["meta"]["b"] == -2
    assert bytes(rows[5]["blob"]) == bytes([5, 255])


def test_read_avro_diagnostics_vs_strict(spark, tmp_path):
    d = tmp_path / "avro_bad"
    d.mkdir()
    (d / "good.avro").write_bytes(encode_avro_records(SCHEMA, _recs(10)))
    corrupt = bytearray(encode_avro_records(SCHEMA, _recs(10)))
    corrupt[-3] ^= 0xFF
    (d / "zbad.avro").write_bytes(bytes(corrupt))

    # strict: the bad shard fails the read with a typed error
    with pytest.raises(Exception, match="BuzzExecutionError|avro"):
        read_avro(spark, str(d)).count()
    # diagnostics: good rows + one error row, stage survives
    df = read_avro(spark, str(d), diagnostics=True)
    rows = df.collect()
    errs = [r for r in rows if r["_error"] is not None]
    assert len(rows) == 11 and len(errs) == 1
    assert "zbad.avro" in errs[0]["_error"]


def test_read_avro_empty_dir(spark, tmp_path):
    d = tmp_path / "none"
    d.mkdir()
    with pytest.raises(BuzzBadRequestError, match="no .avro files"):
        read_avro(spark, str(d))


def test_negative_block_count_raises_not_hangs():
    """A negative block byte-count (2-byte corruption) must raise — the
    unguarded read would rewind and loop forever."""
    from buzz_rust_spark.sources.avro import _Writer

    # append a malicious block (n_records=0, n_bytes=-18) to a frameless file
    hdr_only = encode_avro_records(SCHEMA, [])
    w = _Writer()
    w.long(0)      # n_records
    w.long(-18)    # n_bytes NEGATIVE
    evil = hdr_only + bytes(w.buf) + hdr_only[-16:]
    with pytest.raises(ValueError):
        decode_avro_file(evil)


def test_named_type_reference_roundtrip():
    """A fixed type defined once and referenced by bare name later — the
    shape Iceberg manifests use — encodes and decodes."""
    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": {"type": "fixed", "name": "md5", "size": 4}},
            {"name": "b", "type": "md5"},  # named reference
        ],
    }
    recs = [{"a": b"\x01\x02\x03\x04", "b": b"\x05\x06\x07\x08"}]
    _, back = decode_avro_file(encode_avro_records(schema, recs))
    assert back == recs
    st = avro_spark_schema(schema)
    assert [f.dataType.simpleString() for f in st.fields] == ["binary", "binary"]


def test_union_branch_picked_by_value_type():
    """['int','string'] union: a string value must encode as the STRING
    branch, not be coerced through int()."""
    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "v", "type": ["int", "string"]}],
    }
    recs = [{"v": 5}, {"v": "5"}, {"v": "xyz"}]
    _, back = decode_avro_file(encode_avro_records(schema, recs))
    assert back == recs
    assert isinstance(back[0]["v"], int) and isinstance(back[1]["v"], str)
    with pytest.raises(ValueError, match="no union branch"):
        encode_avro_records(schema, [{"v": 1.5}])


def test_union_exact_type_branch_beats_promoting_match():
    """Under ['double','int'] an int must take the INT branch — schema-order
    first-match would promote it to double and round-trip 5 as 5.0,
    silently changing the value's type.  The int→double promotion stays
    available for unions with no integer branch."""
    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "v", "type": ["double", "int"]}],
    }
    recs = [{"v": 5}, {"v": 1.5}]
    _, back = decode_avro_file(encode_avro_records(schema, recs))
    assert back == recs
    assert isinstance(back[0]["v"], int) and isinstance(back[1]["v"], float)

    promo = {
        "type": "record", "name": "p",
        "fields": [{"name": "v", "type": ["null", "double"]}],
    }
    _, back = decode_avro_file(encode_avro_records(promo, [{"v": 5}]))
    assert back == [{"v": 5.0}]


def test_corrupt_first_file_diagnostics_survives(spark, tmp_path):
    """diagnostics=True must survive a corrupt LEXICOGRAPHICALLY-FIRST shard
    (schema derivation skips to the next parsable header)."""
    d = tmp_path / "avro_first_bad"
    d.mkdir()
    (d / "aaa.avro").write_bytes(b"NotAvro" * 10)
    (d / "bbb.avro").write_bytes(encode_avro_records(SCHEMA, _recs(7)))
    rows = read_avro(spark, str(d), diagnostics=True).collect()
    errs = [r for r in rows if r["_error"] is not None]
    assert len(rows) == 8 and len(errs) == 1 and "aaa.avro" in errs[0]["_error"]
    # strict mode: typed error instead
    with pytest.raises(Exception, match="BuzzExecutionError|avro"):
        read_avro(spark, str(d)).count()


def test_schema_mismatch_is_error_not_null_columns(spark, tmp_path):
    """A shard whose embedded schema disagrees must surface as an error row
    (diagnostics) or typed failure (strict) — never silently-null columns."""
    other = {
        "type": "record", "name": "doc",
        "fields": [{"name": "something_else", "type": "long"}],
    }
    d = tmp_path / "avro_mix"
    d.mkdir()
    (d / "a.avro").write_bytes(encode_avro_records(SCHEMA, _recs(5)))
    (d / "b.avro").write_bytes(
        encode_avro_records(other, [{"something_else": 1}])
    )
    rows = read_avro(spark, str(d), diagnostics=True).collect()
    errs = [r for r in rows if r["_error"] is not None]
    assert len(errs) == 1 and "schema mismatch" in errs[0]["_error"]
    assert len(rows) == 6
    with pytest.raises(Exception, match="BuzzExecutionError|mismatch"):
        read_avro(spark, str(d)).count()


def test_snappy_block_format_copies_and_malformations():
    """The pure-python snappy decoder handles real compressor output
    (copy elements, overlapping RLE copies) and types every malformation."""
    from buzz_rust_spark.sources.avro import _snappy_compress, _snappy_decompress

    # copy with 1-byte offset: "abcd" then copy(len=4, off=4)
    assert (
        _snappy_decompress(bytes([8, 3 << 2]) + b"abcd" + bytes([0x01, 0x04]))
        == b"abcdabcd"
    )
    # overlapping copy = RLE: "a" then copy(len=4, off=1)
    assert (
        _snappy_decompress(bytes([5, 0]) + b"a" + bytes([0x01, 0x01]))
        == b"aaaaa"
    )
    # 2-byte-offset copy form
    assert (
        _snappy_decompress(
            bytes([8, 3 << 2]) + b"abcd" + bytes([(3 << 2) | 2, 4, 0])
        )
        == b"abcdabcd"
    )
    # all-literal self round-trip incl. the multi-byte literal-length form
    import os as _os

    for payload in (b"", b"x", _os.urandom(70000)):
        assert _snappy_decompress(_snappy_compress(payload)) == payload
    # malformations: declared-length mismatch, bad offset, truncation
    with pytest.raises(ValueError, match="declared"):
        _snappy_decompress(bytes([9, 3 << 2]) + b"abcd" + bytes([0x01, 0x04]))
    with pytest.raises(ValueError, match="offset"):
        _snappy_decompress(bytes([4, 0]) + b"a" + bytes([0x01, 0x09]))
    with pytest.raises(ValueError, match="truncated"):
        _snappy_decompress(bytes([10, 60 << 2]))


def test_snappy_crc_frame_checked():
    """Avro frames snappy blocks with a big-endian CRC32 of the
    uncompressed bytes — a flipped data byte must be a typed error."""
    payload = bytearray(
        encode_avro_records(SCHEMA, _recs(50), codec="snappy")
    )
    payload[-25] ^= 0xFF
    with pytest.raises(ValueError):
        decode_avro_file(bytes(payload))


def test_split_read_matches_whole_and_parallelizes(spark, tmp_path):
    """A many-block file read with a small split_bytes yields exactly the
    whole-file rows across >1 task (sync-marker input splits)."""
    recs = _recs(600)
    blob = encode_avro_records(SCHEMA, recs, records_per_block=16)
    p = tmp_path / "big.avro"
    p.write_bytes(blob)

    whole = read_avro(spark, str(p))
    split_sz = max(1, len(blob) // 7)
    split = read_avro(spark, str(p), split_bytes=split_sz)
    assert split.rdd.getNumPartitions() > 1
    assert sorted(r["doc_id"] for r in split.collect()) == sorted(
        r["doc_id"] for r in whole.collect()
    )
    assert split.count() == 600
    # spot-check a full row survives the range path
    row = {r["doc_id"]: r for r in split.collect()}[3]
    assert list(row["tags"]) == ["t0", "t1", "t2"]


def test_split_read_mixed_with_small_files(spark, tmp_path):
    """Split planning composes with whole-file shards: big files range-split,
    small ones stay one task, rows union exactly."""
    d = tmp_path / "mix"
    d.mkdir()
    big = encode_avro_records(SCHEMA, _recs(300), records_per_block=8)
    (d / "big.avro").write_bytes(big)
    (d / "small.avro").write_bytes(
        encode_avro_records(SCHEMA, _recs(20, start=1000), codec="snappy")
    )
    df = read_avro(spark, str(d), split_bytes=len(big) // 4)
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == sorted(list(range(300)) + list(range(1000, 1020)))


def test_header_metadata_roundtrip():
    """Extra file-header metadata (Iceberg manifests carry schema /
    partition-spec keys there) encodes without disturbing record decode,
    and reserved avro.* keys are refused."""
    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.sources.avro import _read_header

    recs = _recs(10)
    payload = encode_avro_records(
        SCHEMA, recs, metadata={"format-version": "2", "content": "data"}
    )
    schema, back = decode_avro_file(payload)
    assert back == recs
    meta_schema, _, _, _ = _read_header(payload)
    assert meta_schema["name"] == "doc"
    # the raw header carries the extra keys
    rd_meta = {}
    from buzz_rust_spark.sources.avro import _MAGIC, _Reader

    rd = _Reader(payload)
    assert rd.read(4) == _MAGIC
    while True:
        count = rd.long()
        if count == 0:
            break
        for _ in range(abs(count)):
            if count < 0:
                rd.long()
            k = rd.bytes_().decode()
            rd_meta[k] = rd.bytes_()
    assert rd_meta["format-version"] == b"2"
    assert rd_meta["content"] == b"data"

    with pytest.raises(BuzzBadRequestError, match="reserved"):
        encode_avro_records(SCHEMA, recs, metadata={"avro.codec": "null"})
