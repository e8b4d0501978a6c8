"""WARC source: Common-Crawl-style shards → one row per record, distributed.

Fixtures are hand-built per ISO 28500 + HTTP/1.1 (no warcio): plain,
record-per-gzip-member, and whole-file-gzip variants; chunked and
gzip-content-encoded HTTP bodies; malformed-shard diagnostics."""

from __future__ import annotations

import gzip
import zlib

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark.sources.warc import read_warc


def _record(wtype: str, body: bytes, uri: str | None = None, extra: dict | None = None) -> bytes:
    headers = [
        "WARC/1.0",
        f"WARC-Type: {wtype}",
        f"WARC-Record-ID: <urn:uuid:{wtype}-1>",
        "WARC-Date: 2024-01-02T03:04:05Z",
    ]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    if wtype in ("response", "request"):
        headers.append("Content-Type: application/http; msgtype=" + wtype)
    else:
        headers.append("Content-Type: application/warc-fields")
    for k, v in (extra or {}).items():
        headers.append(f"{k}: {v}")
    headers.append(f"Content-Length: {len(body)}")
    return ("\r\n".join(headers) + "\r\n\r\n").encode() + body + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html", extra: str = "") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n{extra}\r\n".encode() + body
    )


def _shard() -> list[bytes]:
    doc1 = b"<html>hello corpus</html>"
    doc2 = b"plain text document two"
    chunked = b"7\r\nchunked\r\n5\r\n-body\r\n0\r\n\r\n"
    gz = gzip.compress(b"gzipped document")
    return [
        _record("warcinfo", b"software: test\r\n"),
        _record("request", _http(b"", 200), uri="http://a.example/1"),
        _record("response", _http(doc1), uri="http://a.example/1"),
        _record("response", _http(doc2, ctype="text/plain"), uri="http://a.example/2"),
        _record(
            "response",
            (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n" + chunked
            ),
            uri="http://a.example/chunked",
        ),
        _record(
            "response",
            (
                b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n"
                b"Content-Encoding: gzip\r\n"
                + f"Content-Length: {len(gz)}\r\n\r\n".encode()
                + gz
            ),
            uri="http://a.example/gz",
        ),
    ]


EXPECT_PAYLOADS = {
    "http://a.example/1": b"<html>hello corpus</html>",
    "http://a.example/2": b"plain text document two",
    "http://a.example/chunked": b"chunked-body",
    "http://a.example/gz": b"gzipped document",
}


@pytest.mark.parametrize("variant", ["plain", "member_gzip", "whole_gzip"])
def test_read_warc_variants(spark, tmp_path, variant):
    recs = _shard()
    if variant == "plain":
        data = b"".join(recs)
    elif variant == "member_gzip":  # the Common Crawl convention
        data = b"".join(gzip.compress(r) for r in recs)
    else:
        data = gzip.compress(b"".join(recs))
    path = tmp_path / "shard-00000.warc.gz"
    path.write_bytes(data)

    df = read_warc(spark, str(path))
    rows = {r.target_uri: r for r in df.collect()}
    assert set(rows) == set(EXPECT_PAYLOADS)  # responses only by default
    for uri, want in EXPECT_PAYLOADS.items():
        r = rows[uri]
        assert bytes(r.payload) == want, uri
        assert r.warc_type == "response"
        assert r.warc_date == "2024-01-02T03:04:05Z"
        assert r.n_bytes == len(want)
    assert rows["http://a.example/1"].http_status == 200
    assert rows["http://a.example/gz"].http_status == 404
    assert rows["http://a.example/2"].http_content_type == "text/plain"


def test_read_warc_all_types_and_offsets(spark, tmp_path):
    path = tmp_path / "shard.warc"
    path.write_bytes(b"".join(_shard()))
    df = read_warc(spark, str(path), record_types=())
    rows = df.collect()
    assert [r.warc_type for r in rows] == [
        "warcinfo", "request", "response", "response", "response", "response",
    ]
    offsets = [r.record_offset for r in rows]
    assert offsets == sorted(offsets) and offsets[0] == 0
    # offsets point at real record starts in the decompressed stream
    blob = path.read_bytes()
    assert all(blob[o : o + 5] == b"WARC/" for o in offsets)


def test_read_warc_gzip_member_offsets_are_compressed(spark, tmp_path):
    """For gzip shards record_offset is the COMPRESSED member offset — the
    coordinate WARC range-access tooling seeks by (one record per member,
    the Common Crawl convention) — so good records and bad-member
    diagnostics share one coordinate system."""
    import gzip as _gzip

    recs = _shard()
    members = [_gzip.compress(r) for r in recs]
    path = tmp_path / "s.warc.gz"
    path.write_bytes(b"".join(members))

    rows = read_warc(spark, str(path), record_types=()).collect()
    want = []
    pos = 0
    for m in members:
        want.append(pos)
        pos += len(m)
    got = sorted(r.record_offset for r in rows)
    assert got == want


def test_read_warc_malformed_shard_diagnostic(spark, tmp_path):
    good = tmp_path / "good.warc"
    good.write_bytes(b"".join(_shard()))
    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"not a warc at all")
    df = read_warc(spark, [str(good), str(bad)])
    rows = df.collect()
    diags = [r for r in rows if r.record_offset == -1]
    assert len(diags) == 1 and "unparseable" in diags[0].truncated
    assert len([r for r in rows if r.record_offset >= 0]) == 4  # good shard intact


def test_read_warc_payload_cap(spark, tmp_path):
    big = b"x" * 1000
    rec = _record("response", _http(big), uri="http://a.example/big")
    path = tmp_path / "s.warc"
    path.write_bytes(rec)
    r = read_warc(spark, str(path), max_payload_bytes=64).collect()[0]
    assert r.n_bytes == 64 and bytes(r.payload) == b"x" * 64


def test_warc_to_documents_pipeline(spark, tmp_path):
    """WARC responses → corpus-shaped documents: HTML stripped JVM-side,
    stable hash doc_ids, non-200 / non-text rows filtered."""
    import gzip as _gzip

    from buzz_rust_spark.sources.warc import warc_to_documents

    html = (
        b"<html><head><script>var x=1;</script></head><body>"
        b"<h1>Heading</h1><p>Body &amp; soul.</p></body></html>"
    )
    recs = [
        _record("warcinfo", b"software: test\r\n"),
        _record("response", _http(html), uri="http://a.example/page"),
        _record(
            "response",
            _http(b"plain words", ctype="text/plain"),
            uri="http://a.example/txt",
        ),
        _record(
            "response",
            _http(b"<html>gone</html>", status=404),
            uri="http://a.example/404",
        ),
        _record(
            "response",
            _http(b"\x89PNG...", ctype="image/png"),
            uri="http://a.example/img",
        ),
    ]
    path = tmp_path / "s.warc.gz"
    path.write_bytes(b"".join(_gzip.compress(r) for r in recs))

    docs = warc_to_documents(read_warc(spark, str(path)))
    rows = {r.target_uri: r for r in docs.collect()}
    # 404 and image filtered; html stripped; plain text passed through
    assert set(rows) == {"http://a.example/page", "http://a.example/txt"}
    page = rows["http://a.example/page"]
    assert page.text == "Heading\nBody & soul."
    assert "var x" not in page.text
    assert page.n_chars == len(page.text)
    assert rows["http://a.example/txt"].text == "plain words"
    # doc_id stable across re-reads (hash of shard+offset)
    again = {r.target_uri: r.doc_id for r in
             warc_to_documents(read_warc(spark, str(path))).collect()}
    assert all(again[u] == rows[u].doc_id for u in rows)


def test_warc_negative_content_length_no_hang(spark, tmp_path):
    """A negative Content-Length must become a diagnostic, not an infinite
    re-parse loop over the same record."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -44\r\n\r\n"
    )
    path = tmp_path / "neg.warc"
    path.write_bytes(bad)
    rows = read_warc(spark, str(path), record_types=()).collect()
    assert len(rows) == 1 and "negative" in rows[0].truncated


def test_warc_rotten_member_contained(spark, tmp_path):
    """One corrupt gzip member loses only its own record: the parser
    resyncs on the next gzip magic and the shard-mates survive."""
    import gzip as _gzip

    recs = _shard()
    members = [_gzip.compress(r) for r in recs]
    members[2] = members[2][:10] + b"\x00" * 8 + members[2][18:]  # corrupt
    path = tmp_path / "rot.warc.gz"
    path.write_bytes(b"".join(members))
    rows = read_warc(spark, str(path), record_types=()).collect()
    good = [r for r in rows if r.record_offset >= 0 or r.truncated is None]
    diags = [r for r in rows if r.truncated and "unparseable" in r.truncated]
    assert len(diags) >= 1
    # the records from the other five members all survive
    assert len([r for r in rows if r.warc_type]) >= 5


def test_warc_capped_payload_flagged(spark, tmp_path):
    path = tmp_path / "s.warc"
    path.write_bytes(_record("response", _http(b"x" * 1000), uri="http://a/big"))
    r = read_warc(spark, str(path), max_payload_bytes=64).collect()[0]
    assert r.n_bytes == 64 and r.truncated == "length"
    # and warc_to_documents refuses to turn the half-document into a row
    from buzz_rust_spark.sources.warc import warc_to_documents

    assert warc_to_documents(read_warc(spark, str(path), max_payload_bytes=64)).count() == 0


def test_warc_fake_chunked_falls_back_to_raw(spark, tmp_path):
    """Servers sometimes advertise chunked but send a plain body — the
    document must survive, not collapse to empty."""
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Transfer-Encoding: chunked\r\n\r\nnot actually chunked"
    )
    path = tmp_path / "s.warc"
    path.write_bytes(_record("response", body, uri="http://a/fake"))
    r = read_warc(spark, str(path)).collect()[0]
    assert bytes(r.payload) == b"not actually chunked"


def test_warc_undecodable_content_encoding_flagged(spark, tmp_path):
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\nnot gzip bytes at all"
    )
    path = tmp_path / "s.warc"
    path.write_bytes(_record("response", body, uri="http://a/badgz"))
    r = read_warc(spark, str(path)).collect()[0]
    assert r.truncated == "content-encoding-undecodable"
    from buzz_rust_spark.sources.warc import warc_to_documents

    assert warc_to_documents(read_warc(spark, str(path))).count() == 0


def test_html_entities_no_double_unescape(spark):
    from pyspark.sql import functions as F

    from buzz_rust_spark.operators.text import html_to_text

    df = spark.createDataFrame(
        [("<p>&amp;lt; stays, don&#8217;t &#x27;quote&#x27; &#169; x &amp; y</p>",)],
        "h string",
    )
    out = df.select(html_to_text(F.col("h")).alias("t")).collect()[0].t
    assert "&lt; stays" in out  # &amp;lt; must NOT collapse to '<'
    assert "don't" in out  # common curly apostrophe decimal ref
    assert "'quote'" in out  # hex refs handled
    assert "&#169;" not in out and "&#x" not in out
    assert "x & y" in out  # bare &amp; still unescapes (last)


# --- URL curation (operators/urlfilter.py) ----------------------------------


def test_url_normalize_rules(spark):
    from pyspark.sql import functions as F

    from buzz_rust_spark.operators.urlfilter import url_normalize

    cases = [
        (
            "HTTPS://WWW.Example.COM:443/Path/Page?a=1&utm_source=x&b=2#frag",
            "https://www.example.com/Path/Page?a=1&b=2",
        ),
        ("http://a.com:80/", "http://a.com"),
        ("http://a.com/?utm_campaign=z", "http://a.com"),
        ("http://a.com/p?fbclid=abc&x=1", "http://a.com/p?x=1"),
        ("http://a.com/CaseSensitive/Path", "http://a.com/CaseSensitive/Path"),
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "u string")
    got = [r.n for r in df.select(url_normalize(F.col("u")).alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_filter_urls_and_dedup(spark):
    from buzz_rust_spark.operators.urlfilter import dedup_by_url, filter_urls

    rows = [
        (0, "https://good.example/page"),
        (1, "http://spam.bad/page"),
        (2, "https://sub.spam.bad/x"),  # suffix match blocks subdomains
        (3, "ftp://good.example/f"),  # off-scheme
        (4, "https://notspam.badx.com/y"),  # NOT a suffix match
        (5, "https://casino.win/big-casino"),  # pattern block
    ]
    df = spark.createDataFrame(rows, "doc_id long, target_uri string")
    kept = sorted(
        r.doc_id
        for r in filter_urls(
            df, block_domains=["spam.bad"], block_patterns=[r"casino"]
        ).collect()
    )
    assert kept == [0, 4]

    dup = spark.createDataFrame(
        [
            (5, "https://A.com:443/x?utm_source=1", "later"),
            (2, "https://a.com/x", "first"),
            (9, "https://a.com/y", "other"),
        ],
        "doc_id long, target_uri string, text string",
    )
    out = {r.target_uri: (r.doc_id, r.text) for r in dedup_by_url(dup).collect()}
    # canonical-equal URLs collapse to the smallest id; columns survive
    assert len(out) == 2 and out["https://a.com/x"] == (2, "first")


def test_url_filter_plan_is_narrow(spark):
    """normalize + filter stay shuffle-free; dedup_by_url is exactly one
    hash-aggregate shuffle (no window, no sort)."""
    from pyspark.sql import functions as F

    from buzz_rust_spark.operators.urlfilter import (
        dedup_by_url,
        filter_urls,
        url_normalize,
    )

    df = spark.createDataFrame(
        [(1, "https://a.com/x", "t")], "doc_id long, target_uri string, text string"
    )
    plan = (
        filter_urls(df.withColumn("curl", url_normalize(F.col("target_uri"))))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
    plan = dedup_by_url(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Window" not in plan


# --- WebDataset tar shards ---------------------------------------------------


def _make_wds_shard(tmp_path, name="shard-0.tar", gz=False, n=4):
    import io
    import json as _json
    import tarfile

    import numpy as np

    from buzz_rust_spark.operators.multimodal import encode_png

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:

        def add(fname, data):
            info = tarfile.TarInfo(fname)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

        for i in range(n):
            key = f"{i:06d}"
            px = np.full((4, 4, 3), i * 40, np.uint8)
            add(f"{key}.png", encode_png(px))
            add(f"{key}.txt", f"caption {i}".encode())
            add(f"{key}.json", _json.dumps({"id": i}).encode())
        add("999999.txt", b"orphan caption with no image")
    data = buf.getvalue()
    if gz:
        import gzip as _gzip

        data = _gzip.compress(data)
        name += ".gz"
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


@pytest.mark.parametrize("gz", [False, True])
def test_read_webdataset_members(spark, tmp_path, gz):
    from buzz_rust_spark.sources.warc import read_webdataset

    path = _make_wds_shard(tmp_path, gz=gz)
    rows = read_webdataset(spark, path).collect()
    by = {(r.key, r.ext): r for r in rows}
    assert len(rows) == 13  # 4 samples x 3 parts + orphan
    assert bytes(by[("000001", "txt")].payload) == b"caption 1"
    assert by[("000002", "png")].n_bytes > 0


def test_webdataset_samples_pivot(spark, tmp_path):
    import numpy as np

    from buzz_rust_spark.operators.multimodal import decode_png
    from buzz_rust_spark.sources.warc import read_webdataset, webdataset_samples

    path = _make_wds_shard(tmp_path)
    samples = webdataset_samples(read_webdataset(spark, path), ("png", "txt"))
    rows = {r.key: r for r in samples.collect()}
    assert set(rows) == {f"{i:06d}" for i in range(4)}  # orphan dropped
    for i in range(4):
        r = rows[f"{i:06d}"]
        assert bytes(r.txt) == f"caption {i}".encode()
        px = decode_png(bytes(r.png))
        assert np.array_equal(px, np.full((4, 4, 3), i * 40, np.uint8))


def test_webdataset_multimodal_pipeline(spark, tmp_path):
    """Samples flow straight into the media operators: decode the PNG part
    with the real codec via decode_features plumbing shapes."""
    from buzz_rust_spark.operators.multimodal import decode_image
    from buzz_rust_spark.sources.warc import read_webdataset, webdataset_samples

    path = _make_wds_shard(tmp_path)
    samples = webdataset_samples(read_webdataset(spark, path), ("png",))
    decoded = samples.rdd.map(lambda r: decode_image(bytes(r.png)).shape).collect()
    assert decoded == [(4, 4, 3)] * 4


def test_webdataset_bad_shard_diagnostic(spark, tmp_path):
    from buzz_rust_spark.sources.warc import read_webdataset

    good = _make_wds_shard(tmp_path)
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"definitely not a tar file" * 40)
    rows = read_webdataset(spark, [good, str(bad)]).collect()
    diags = [r for r in rows if r.note and "unparseable" in r.note]
    assert len(diags) == 1
    assert len(rows) - len(diags) == 13  # good shard intact


def test_webdataset_first_dot_keys_and_concat_gzip(spark, tmp_path):
    """WebDataset splits key/ext at the FIRST dot ('x.seg.png' groups with
    'x.jpg'); concatenated gzip members (pigz/bgzip output) decompress as
    one logical stream."""
    import gzip as _gzip
    import io
    import tarfile

    from buzz_rust_spark.sources.warc import read_webdataset, webdataset_samples

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        def add(fname, data):
            info = tarfile.TarInfo(fname)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        add("000001.txt", b"t1")
        add("000001.seg.png", b"fake-mask")
        add("000002.txt", b"t2")
        add("000002.seg.png", b"fake-mask-2")
    data = buf.getvalue()
    # two concatenated gzip members
    half = len(data) // 2
    path = tmp_path / "cat.tar.gz"
    path.write_bytes(_gzip.compress(data[:half]) + _gzip.compress(data[half:]))
    rows = read_webdataset(spark, str(path)).collect()
    assert {(r.key, r.ext) for r in rows} == {
        ("000001", "txt"), ("000001", "seg.png"),
        ("000002", "txt"), ("000002", "seg.png"),
    }
    samples = webdataset_samples(read_webdataset(spark, str(path)), ("txt", "seg.png"))
    assert samples.count() == 2


def test_webdataset_oversize_member_flagged(spark, tmp_path):
    import io
    import tarfile

    from buzz_rust_spark.sources.warc import read_webdataset

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        info = tarfile.TarInfo("000001.bin")
        big = b"x" * 1000
        info.size = len(big)
        tar.addfile(info, io.BytesIO(big))
        info = tarfile.TarInfo("000001.txt")
        info.size = 2
        tar.addfile(info, io.BytesIO(b"ok"))
    path = tmp_path / "s.tar"
    path.write_bytes(buf.getvalue())
    rows = {r.ext: r for r in read_webdataset(spark, str(path), max_member_bytes=100).collect()}
    assert rows["bin"].note == "oversize-skipped"
    assert rows["bin"].payload is None and rows["bin"].n_bytes == 1000
    assert rows["txt"].note is None and bytes(rows["txt"].payload) == b"ok"
