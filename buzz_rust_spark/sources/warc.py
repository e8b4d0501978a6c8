"""WARC web-archive source: Common-Crawl-style shards → one row per record.

Web-scale training corpora arrive as WARC 1.0/1.1 shards (the ISO 28500
format Common Crawl publishes): a sequence of records (warcinfo, request,
response, ...), each a header block + Content-Length payload, usually with
EVERY record individually gzip-compressed and concatenated (the "gzip
member per record" convention that makes shards seekable).  The reference
engine is parquet-only (SURVEY.md §2.A); this source is part of the
rebuild's training-data surface, next to the documents/embeddings
operators.

Spark-first shape:
- ``spark.read.format("binaryFile")`` distributes WHOLE SHARDS — the
  parallelism unit is the file, exactly how Common Crawl sizes its ~1 GB
  shards for distributed processing.  A 100 TB crawl is ~100k shards →
  100k tasks; no shuffle anywhere, the parse is a pure fan-out map.
- Record parsing runs in Arrow-batched ``mapInPandas`` on the executors;
  one input row (shard) yields many output rows (records).  Per-task
  memory is bounded by the shard size plus one record's payload
  (``max_payload_bytes`` caps rogue records).
- HTTP response payloads are unwrapped (status + headers parsed off,
  chunked transfer-encoding de-chunked, gzip/deflate content-encoding
  decompressed) so downstream text operators see the document bytes.

Everything is stdlib (zlib) + the published WARC/HTTP formats — no warcio
dependency.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("warc_file", StringType(), False),
        StructField("record_offset", LongType(), False),
        StructField("warc_type", StringType(), True),
        StructField("record_id", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("http_content_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("truncated", StringType(), True),
    ]
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes, max_bytes: int) -> Iterator[tuple[int, object]]:
    """Decompress a stream of concatenated gzip members (the WARC
    record-per-member convention); a single-member file yields one blob.
    Yields ``(compressed_offset, bytes)`` per good member and
    ``(compressed_offset, ValueError)`` for a bad one — one rotten member
    must not cost the other ~50k records of a shard — resyncing on the
    next gzip magic.  Inflation per member is capped (zlib-bomb guard);
    the whole input is wrapped in ONE memoryview so per-member slices are
    zero-copy (a bytes slice per record would memcpy the shard tail ~50k
    times)."""
    mv = memoryview(data)
    pos = 0
    while pos < len(data) and bytes(mv[pos : pos + 2]) == _GZIP_MAGIC:
        try:
            d = zlib.decompressobj(wbits=31)
            out = d.decompress(mv[pos:], max_bytes)
            if not d.eof:
                raise ValueError(
                    "gzip member exceeds max_payload_bytes or is truncated"
                )
        except (zlib.error, ValueError) as exc:
            yield pos, ValueError(str(exc))
            nxt = data.find(_GZIP_MAGIC + b"\x08", pos + 2)
            if nxt < 0:
                return
            pos = nxt
            continue
        yield pos, out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _parse_warc_records(blob: bytes, base_offset: int):
    """One decompressed region → [(offset, headers dict, payload bytes)].
    Header names are lower-cased; the WARC version line is validated."""
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        head = blob[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError as exc:
            raise ValueError(f"bad Content-Length: {exc}") from exc
        if length < 0:
            # a negative length would walk pos BACKWARDS — with the right
            # value, an infinite re-parse loop over the same record
            raise ValueError(f"negative Content-Length {length}")
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError("record payload overruns file")
        out.append((base_offset + pos, headers, blob[body_start : body_start + length]))
        pos = body_start + length
    return out


def _dechunk(body: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(body):
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            break
        try:
            size = int(body[pos:nl].split(b";")[0], 16)
        except ValueError:
            break
        if size == 0:
            break
        out += body[nl + 2 : nl + 2 + size]
        pos = nl + 2 + size + 2  # skip chunk + trailing CRLF
    # servers sometimes advertise chunked but send a plain body — an empty
    # de-chunk must fall back to the raw payload, not lose the document
    return bytes(out) if out else body


def _parse_http_response(body: bytes, max_bytes: int):
    """Raw HTTP/1.x response → (status, content_type, document bytes,
    note).  De-chunks and decompresses gzip/deflate content-encoding;
    undecodable payloads fall back to the raw body with a non-null note
    (never raise — one rotten record must not kill a shard, but the
    compressed bytes must not masquerade as clean text either)."""
    head_end = body.find(b"\r\n\r\n")
    if head_end < 0 or not body[:5].startswith(b"HTTP/"):
        return None, None, body, None
    head = body[:head_end].decode("latin-1", "replace")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    payload = body[head_end + 4 :]
    note = None
    if "chunked" in headers.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
    enc = headers.get("content-encoding", "").lower()
    if enc in ("gzip", "x-gzip", "deflate"):
        try:
            d = zlib.decompressobj(wbits=47 if enc != "deflate" else 15)
            inflated = d.decompress(payload, max_bytes)
            if d.eof:
                payload = inflated
            else:
                note = "content-encoding-undecodable"
        except zlib.error:
            note = "content-encoding-undecodable"
    return status, headers.get("content-type"), payload, note


def read_warc(
    spark: SparkSession,
    paths: str | list[str],
    record_types: tuple[str, ...] = ("response",),
    max_payload_bytes: int = 64 * 1024 * 1024,
    batch_files: int | None = None,
) -> DataFrame:
    """Distributed WARC read: ``paths`` (file/dir/glob, like any Spark
    source) → one row per record of the requested ``record_types``
    (lower-case; ``()`` keeps every type).  See module docstring for the
    scale shape."""
    types = tuple(t.lower() for t in record_types)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in WARC_SCHEMA.fields]
        for batch in batches:
            rows = []
            for path, content in zip(batch["path"], batch["content"]):
                data = bytes(content)

                def diag(off, exc):
                    # a malformed region yields one diagnostic row, not a
                    # stage failure OR the loss of its shard-mates
                    rows.append(
                        dict.fromkeys(cols)
                        | {
                            "warc_file": path,
                            "record_offset": -1 if off is None else off,
                            "truncated": f"unparseable: {exc}",
                        }
                    )

                records = []
                if data[:2] == _GZIP_MAGIC:
                    # record_offset for gzip shards is the COMPRESSED member
                    # offset (plus intra-member position for nonstandard
                    # multi-record members, which is 0 in the conventional
                    # 1-record-per-member layout) — the same coordinate WARC
                    # range-access tooling seeks by, and the same coordinate
                    # the bad-member diagnostics below already use.
                    for cpos, blob in _gunzip_members(data, max_payload_bytes):
                        if isinstance(blob, Exception):
                            diag(cpos, blob)
                            continue
                        # per-member containment: one rotten member's
                        # records are lost, the other ~50k survive
                        try:
                            records.extend(_parse_warc_records(blob, cpos))
                        except ValueError as exc:
                            diag(cpos, exc)
                else:
                    try:
                        records.extend(_parse_warc_records(data, 0))
                    except ValueError as exc:
                        diag(None, exc)
                for off, headers, body in records:
                    wtype = headers.get("warc-type", "").lower()
                    if types and wtype not in types:
                        continue
                    status = http_ct = note = None
                    payload = body
                    if headers.get("content-type", "").startswith(
                        "application/http"
                    ):
                        status, http_ct, payload, note = _parse_http_response(
                            body, max_payload_bytes
                        )
                    if len(payload) > max_payload_bytes:
                        payload = payload[:max_payload_bytes]
                        # same convention as the WARC-Truncated header —
                        # a capped row must be distinguishable downstream
                        note = note or "length"
                    rows.append(
                        {
                            "warc_file": path,
                            "record_offset": off,
                            "warc_type": wtype,
                            "record_id": headers.get("warc-record-id"),
                            "target_uri": headers.get("warc-target-uri"),
                            "warc_date": headers.get("warc-date"),
                            "content_type": headers.get("content-type"),
                            "http_status": status,
                            "http_content_type": http_ct,
                            "payload": payload,
                            "n_bytes": len(payload),
                            "truncated": headers.get("warc-truncated") or note,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(paths).select("path", "content")
    if batch_files:
        files = files.repartition(batch_files)
    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_to_documents(warc_df: DataFrame, min_chars: int = 1) -> DataFrame:
    """WARC response rows → training-document rows: keep HTTP 200 HTML/text
    responses, decode the payload as UTF-8 (invalid bytes replaced), strip
    markup via :func:`~buzz_rust_spark.operators.text.html_to_text`, and
    emit ``(doc_id, text, source, n_chars)`` in the shape of the corpus
    tables the dedup/quality operators consume.

    ``doc_id`` is the 64-bit hash of (shard, offset) — stable across reruns
    of the same crawl, no window function, no shuffle; ``source`` is the
    shard file.  The whole stage is a narrow JVM projection over the WARC
    scan."""
    from pyspark.sql import functions as F

    from ..operators.text import html_to_text

    ct = F.lower(F.coalesce(F.col("http_content_type"), F.lit("")))
    is_html = ct.startswith("text/html") | ct.startswith("application/xhtml")
    raw = F.decode(F.col("payload"), "UTF-8")
    text = F.when(is_html, html_to_text(raw)).otherwise(F.trim(raw))
    return (
        warc_df.where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & (is_html | ct.startswith("text/plain"))
            # capped or undecodable payloads must not become mojibake docs
            & F.col("truncated").isNull()
        )
        .select(
            F.xxhash64("warc_file", "record_offset").alias("doc_id"),
            text.alias("text"),
            F.col("warc_file").alias("source"),
            F.col("target_uri"),
        )
        .where(F.length("text") >= min_chars)
        .withColumn("n_chars", F.length("text"))
    )


WEBDATASET_SCHEMA = StructType(
    [
        StructField("shard", StringType(), False),
        StructField("key", StringType(), False),
        StructField("ext", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        # non-null when something is wrong with this row: "oversize-skipped"
        # (payload withheld, n_bytes = true size) or "unparseable: ..."
        StructField("note", StringType(), True),
    ]
)


def read_webdataset(
    spark: SparkSession,
    paths: str | list[str],
    max_member_bytes: int = 256 * 1024 * 1024,
    max_shard_bytes: int = 8 * 1024 * 1024 * 1024,
) -> DataFrame:
    """WebDataset intake: ``.tar`` shards whose members are named
    ``<key>.<ext>`` — key up to the FIRST dot, extension everything after
    (the WebDataset convention: ``000123.jpg`` + ``000123.seg.png`` share
    key ``000123``) → one row per member.  Gzip-compressed shards
    (``.tar.gz``, including concatenated-member streams from pigz/bgzip)
    decompress inline up to ``max_shard_bytes``.

    Oversized members and unparseable shards yield rows with a non-null
    ``note`` (payload withheld) instead of vanishing — a dropped sample
    must be countable downstream.

    Same scale shape as :func:`read_warc`: the shard is the parallelism
    unit (binaryFile + ``mapInPandas``), no shuffle; group the result by
    ``key`` (or :func:`webdataset_samples`) to reassemble samples — that
    ONE aggregation is the only shuffle a sample-assembly pipeline needs,
    and it is keyed by sample, never by shard."""
    import io
    import tarfile

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in WEBDATASET_SCHEMA.fields]

        def diag(rows, path, msg):
            rows.append(
                dict.fromkeys(cols)
                | {"shard": path, "key": "", "ext": "", "note": msg}
            )

        for batch in batches:
            rows = []
            for path, content in zip(batch["path"], batch["content"]):
                data = bytes(content)
                if data[:2] == _GZIP_MAGIC:
                    # concatenated gzip members are one logical stream
                    parts, total, bad = [], 0, None
                    for _, blob in _gunzip_members(data, max_shard_bytes):
                        if isinstance(blob, Exception):
                            bad = str(blob)
                            break
                        parts.append(blob)
                        total += len(blob)
                        if total > max_shard_bytes:
                            bad = f"shard inflates past {max_shard_bytes}"
                            break
                    if bad is not None:
                        diag(rows, path, f"unparseable: {bad}")
                        continue
                    data = b"".join(parts)
                try:
                    with tarfile.open(fileobj=io.BytesIO(data)) as tar:
                        for m in tar:
                            if not m.isfile():
                                continue
                            name = m.name.lstrip("./")
                            key, dot, ext = name.partition(".")
                            if m.size > max_member_bytes:
                                rows.append(
                                    {
                                        "shard": path,
                                        "key": key,
                                        "ext": ext.lower(),
                                        "payload": None,
                                        "n_bytes": m.size,
                                        "note": "oversize-skipped",
                                    }
                                )
                                continue
                            fh = tar.extractfile(m)
                            payload = fh.read() if fh else None
                            rows.append(
                                {
                                    "shard": path,
                                    "key": key,
                                    "ext": ext.lower(),
                                    "payload": payload,
                                    "n_bytes": len(payload or b""),
                                    "note": None,
                                }
                            )
                except tarfile.TarError as exc:
                    diag(rows, path, f"unparseable: {exc}")
            yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(paths).select("path", "content")
    return files.mapInPandas(parse, schema=WEBDATASET_SCHEMA)


def webdataset_samples(wds_df: DataFrame, exts: tuple[str, ...]) -> DataFrame:
    """Member rows → one row per SAMPLE with a binary column per requested
    extension (``exts=("jpg", "txt")`` → columns ``jpg``, ``txt``) — the
    pivot every training loader performs.  One hash-aggregate shuffle keyed
    by (shard, key); samples missing any requested part are dropped (the
    standard strict-sample behavior)."""
    from pyspark.sql import functions as F

    aggs = [
        F.max(F.when(F.col("ext") == e, F.col("payload"))).alias(e) for e in exts
    ]
    out = (
        wds_df.where(F.col("ext").isin(*exts) & F.col("note").isNull())
        .groupBy("shard", "key")
        .agg(*aggs)
    )
    cond = None
    for e in exts:
        # backtick-quote: WebDataset extensions may contain dots
        # ("seg.png"), which bare F.col would parse as struct access
        c = F.col(f"`{e}`").isNotNull()
        cond = c if cond is None else (cond & c)
    return out.where(cond)
