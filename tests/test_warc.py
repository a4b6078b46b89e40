"""Raw WARC (response-record) codec tests: framing, HTTP-head split,
record-type skipping, disk reads, and the intake composition with the
HTML extractor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.sources.warc import (
    parse_warc,
    read_warc,
    warc_encode,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_roundtrip_with_adversarial_bodies(spark):
    """Bodies containing the record separator, WARC magic, an embedded
    fake HTTP head, and multi-byte unicode must round-trip byte-exact
    (Content-Length framing end to end)."""
    rows = [
        (0, "<p>plain</p>"),
        (1, "body with\r\n\r\nseparator and WARC/1.0 magic"),
        (2, "fake head HTTP/1.1 500 Broken\r\n\r\ninside body"),
        (3, "unicode: 你好 — café \U0001f600"),
        (4, ""),
        (5, None),
    ]
    parsed = parse_warc(warc_encode(_pages(spark, rows), shards=2))
    got = {
        int(r["target_uri"].rsplit("/", 1)[-1]): r for r in parsed.collect()
    }
    assert len(got) == len(rows)
    for i, h in rows:
        expect = h or ""
        assert got[i]["html"] == expect, i
        assert got[i]["n_bytes"] == len(expect.encode("utf-8"))
        assert got[i]["http_status"] == 200
        assert got[i]["content_type"].startswith("text/html")


def test_non_response_records_skipped_without_desync(spark):
    """request/metadata records interleaved between responses are
    skipped BY TYPE with their lengths consumed — the later response
    still parses correctly (framing never desynchronizes)."""
    sep = b"\r\n\r\n"

    def rec(wtype: str, payload: bytes, uri: str = "http://x/") -> bytes:
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + sep

    body = b"<p>the real body</p>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    blob = (
        rec("warcinfo", b"software: test\r\n\r\ntrailing")
        + rec("request", b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        + rec("response", http, uri="http://doc/7")
        + rec("metadata", b"fetch-time: 1")
    )
    df = spark.createDataFrame([(1, bytearray(blob))], "shard_id int, content binary")
    rows = parse_warc(df).collect()
    assert len(rows) == 1
    assert rows[0]["target_uri"] == "http://doc/7"
    assert rows[0]["html"] == body.decode()
    assert rows[0]["http_status"] == 200


def test_headless_payload_degrades_to_status_zero(spark):
    """A response payload with no HTTP head (malformed crawl data)
    yields the whole payload as html with status 0 — lenient, never
    dying mid-shard."""
    sep = b"\r\n\r\n"
    payload = b"<p>no http head at all</p>"
    head = (
        "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    df = spark.createDataFrame(
        [(1, bytearray(head + payload + sep))], "shard_id int, content binary"
    )
    r = parse_warc(df).collect()[0]
    assert r["http_status"] == 0 and r["html"] == payload.decode()


def test_malformed_header_raises(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"NOT-WARC nonsense\r\n\r\npayload"))],
        "shard_id int, content binary",
    )
    with pytest.raises(Exception, match="WARC"):
        parse_warc(df).collect()


def test_read_warc_from_disk_and_extract(spark, tmp_path):
    """End-to-end intake: encode pages to shard files on disk, read
    them back with one binaryFile row per shard, extract main content —
    nav dropped, article kept."""
    from quantlab_data_pipeline_spark.llm.extract import html_to_text

    art = (
        "The crawler fetched this page and the extractor must keep "
        "exactly this paragraph of article text."
    )
    page = (
        '<html><body><nav><a href="/">Home</a></nav>'
        f"<p>{art}</p></body></html>"
    )
    rows = [(i, page) for i in range(6)]
    shards = warc_encode(_pages(spark, rows), shards=3).collect()
    for r in shards:
        (tmp_path / f"crawl-{r['shard_id']}.warc").write_bytes(
            bytes(r["content"])
        )
    parsed = read_warc(spark, str(tmp_path / "*.warc"))
    out = html_to_text(parsed, "html", "text").select("target_uri", "text")
    got = out.collect()
    assert len(got) == 6
    assert all(r["text"] == art for r in got)
