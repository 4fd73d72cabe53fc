"""WARC source: record-level parse round trips (plain and member-per-record
gzip, chunked transfer-encoding, gzip content-encoding, mixed record
types), the Ray Dataset reader, and the WARC → html→text chain."""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa
import pytest

from epichypersketch_jl_ray.sources.warc import encode_warc, parse_warc, read_warc


def _records(n: int = 12) -> list[dict]:
    recs = []
    for i in range(n):
        html = (
            f"<html><head><title>Doc {i}</title></head>"
            f"<body><p>hello world {i}</p><script>var x={i};</script></body></html>"
        ).encode()
        recs.append({"url": f"http://example.com/{i}", "payload": html, "http_status": 200})
    return recs


@pytest.mark.parametrize("layout", ["plain", "gz", "zst"])
def test_parse_round_trip(layout):
    recs = _records()
    raw = encode_warc(
        recs, gzip_per_record=layout == "gz", zstd_per_record=layout == "zst"
    )
    out = parse_warc(raw)
    assert len(out) == len(recs)
    for want, got in zip(recs, out):
        assert got["warc_type"] == "response"
        assert got["url"] == want["url"]
        assert got["http_status"] == 200
        assert got["content_type"].startswith("text/html")
        assert got["payload"] == want["payload"]


def test_parse_zst_with_leading_skippable_frame():
    import struct

    recs = _records()
    raw = encode_warc(recs, zstd_per_record=True)
    # webrecorder-style seekable streams carry skippable index frames
    skippable = struct.pack("<II", 0x184D2A50, 8) + b"IDXBYTES"
    out = parse_warc(skippable + raw)
    assert [r["url"] for r in out] == [r["url"] for r in recs]


def test_chunked_and_content_encoding():
    recs = _records(6)
    raw = encode_warc(recs, gzip_per_record=True, chunked_every=2)
    out = parse_warc(raw)
    for want, got in zip(recs, out):
        assert got["payload"] == want["payload"]
    # hand-build a Content-Encoding: gzip response record
    body = gzip.compress(b"<html><body>compressed page</body></html>")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Encoding: gzip\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:x>\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\nWARC-Target-URI: http://e.com/\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
    )
    (got,) = parse_warc(rec)
    assert got["payload"] == b"<html><body>compressed page</body></html>"


def test_mixed_record_types_and_errors():
    recs = [
        {"warc_type": "warcinfo", "payload": b"software: test", "content_type": "application/warc-fields"},
        {"url": "http://a.com", "payload": b"<html><body>a</body></html>"},
        {"warc_type": "request", "url": "http://a.com", "payload": b"GET / HTTP/1.1\r\n\r\n"},
    ]
    out = parse_warc(encode_warc(recs, gzip_per_record=False))
    assert [r["warc_type"] for r in out] == ["warcinfo", "response", "request"]
    with pytest.raises(ValueError):
        parse_warc(b"NOT A WARC FILE")
    with pytest.raises(ValueError):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")  # no Content-Length


def test_read_warc_dataset_and_text_chain(ray_session, tmp_path):
    # two shard files, as a sharded corpus directory would look
    for shard in range(2):
        recs = _records(10)
        for r in recs:
            r["url"] = r["url"].replace("example.com", f"shard{shard}.com")
        (tmp_path / f"part-{shard}.warc.gz").write_bytes(
            encode_warc(recs, gzip_per_record=True, chunked_every=3)
        )
    ds = read_warc([str(tmp_path / f"part-{s}.warc.gz") for s in range(2)])
    rows = ds.take_all()
    assert len(rows) == 20
    assert {r["warc_type"] for r in rows} == {"response"}
    assert all(r["http_status"] == 200 for r in rows)
    # chain into the generic html→text extractor, Ray-side
    from epichypersketch_jl_ray.functions.html import extract_text_generic

    def to_text(batch: pa.Table) -> pa.Table:
        html = pa.array([p.decode("utf-8", "replace") for p in batch["payload"].to_pylist()])
        return pa.table({"url": batch["url"], "text": extract_text_generic(html)})

    texts = ds.map_batches(to_text, batch_format="pyarrow").take_all()
    assert len(texts) == 20
    for t in texts:
        assert "hello world" in t["text"]
        assert "var x" not in t["text"]  # scripts stripped


def test_read_warc_keeps_all_types(ray_session, tmp_path):
    recs = [
        {"warc_type": "warcinfo", "payload": b"software: test", "content_type": "application/warc-fields"},
        {"url": "http://a.com", "payload": b"<html><body>a</body></html>"},
    ]
    p = tmp_path / "one.warc"
    p.write_bytes(encode_warc(recs, gzip_per_record=False))
    assert read_warc(str(p), record_types=None).count() == 2
    assert read_warc(str(p)).count() == 1


def test_read_wet_conversion_records(ray_session, tmp_path):
    """Common Crawl WET layout: a .warc.gz whose records are warc_type
    'conversion' with text/plain extracted text — read_warc handles it via
    record_types=('conversion',), no separate reader needed."""
    recs = [
        {
            "warc_type": "conversion",
            "url": f"http://site{i}.example/page",
            "payload": f"extracted plain text of page {i}\nsecond line".encode(),
            "content_type": "text/plain",
        }
        for i in range(6)
    ]
    # WET files also open with a warcinfo record
    recs.insert(0, {"warc_type": "warcinfo", "payload": b"format: WET", "content_type": "application/warc-fields"})
    p = tmp_path / "seg.warc.wet.gz"
    p.write_bytes(encode_warc(recs, gzip_per_record=True))
    ds = read_warc(str(p), record_types=("conversion",))
    rows = ds.take_all()
    assert len(rows) == 6
    assert {r["warc_type"] for r in rows} == {"conversion"}
    assert all(r["content_type"] == "text/plain" for r in rows)
    assert all(b"extracted plain text" in r["payload"] for r in rows)
    # payload is already text: no HTTP envelope on conversion records
    assert all(not bytes(r["payload"]).startswith(b"HTTP/") for r in rows)
