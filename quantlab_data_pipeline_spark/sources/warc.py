"""Raw WARC (response-record) codec — the step BEFORE the WET format.

Common Crawl's primary artifact is the raw WARC: each record is a
``WARC/1.0`` header block (``WARC-Type: response``,
``WARC-Target-URI``, ``Content-Length``) whose payload is a full HTTP
response — status line, HTTP headers, blank line, then the HTML body.
The WET files the :mod:`.wet` codec reads are derived from these by
exactly the HTML→text extraction :mod:`..llm.extract` implements; this
module supplies the missing intake edge so the pipeline can start from
the crawl itself: ``read_warc`` → ``llm.extract.html_to_text`` →
every curation op.

Same execution shape as the WET codec (`sources/wet.py`): framing is
Content-Length byte walking — genuinely imperative, so it rides the
Arrow-batched ``mapInPandas`` path; one shard file = one task
(``binaryFile`` rows carry whole shards, Common Crawl's distribution
unit); the parsed output is narrow (uri, status, content_type, html)
and everything downstream is Catalyst.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["warc_encode", "parse_warc", "read_warc"]

_RECORD_SEP = b"\r\n\r\n"


def warc_encode(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    shards: int = 4,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> DataFrame:
    """(shard_id, content): pages serialized as WARC response records —
    shard = id mod ``shards``, ascending id order within a shard
    (deterministic, engine-replayable). Each record's payload is a full
    HTTP response (status line + headers + blank line + body), with the
    WARC ``Content-Length`` covering the WHOLE payload, per the spec.
    Null html encodes as an empty body."""
    base = docs.select(
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("__shard"),
        F.col(id_col).cast("long").alias("__id"),
        F.coalesce(F.col(html_col), F.lit("")).alias("__html"),
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id")
        buf = bytearray()
        for rid, html in zip(pdf["__id"], pdf["__html"]):
            body = str(html).encode("utf-8")
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {content_type}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii") + body
            header = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: http://doc/{int(rid)}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode("ascii")
            buf += header + http + _RECORD_SEP
        return pd.DataFrame(
            {"shard_id": [int(pdf["__shard"].iloc[0])], "content": [bytes(buf)]}
        )

    return base.groupBy("__shard").applyInPandas(
        assemble, "shard_id int, content binary"
    )


def parse_warc(shards: DataFrame, content_col: str = "content") -> DataFrame:
    """(target_uri, http_status, content_type, n_bytes, html) per
    RESPONSE record across all shard blobs.

    Content-Length framing identical to the WET parser: the payload is
    sliced by byte count, never by marker search, so bodies containing
    ``WARC/1.0`` or blank lines round-trip intact. Non-response records
    (request/metadata/warcinfo — real crawls interleave them) are
    skipped by type, NOT by guesswork: the walk still consumes their
    declared lengths, so framing never desynchronizes. A truncated
    trailing record is dropped (lenient, like WET); a malformed header
    raises. The HTTP head is split at its first blank line; a payload
    with no HTTP head (malformed) yields the whole payload as html with
    status 0 rather than dying mid-shard."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uris: list[str] = []
            stats: list[int] = []
            ctypes: list[str] = []
            lens: list[int] = []
            htmls: list[str] = []
            for blob in pdf[content_col]:
                b = bytes(blob)
                pos = 0
                while pos < len(b):
                    hdr_end = b.find(_RECORD_SEP, pos)
                    if hdr_end < 0:
                        if b[pos:].strip():
                            raise ValueError(
                                f"unterminated WARC header at byte {pos}"
                            )
                        break
                    lines = b[pos:hdr_end].decode("utf-8").split("\r\n")
                    if not lines or not lines[0].startswith("WARC/"):
                        raise ValueError(
                            f"record at byte {pos} does not start with WARC/"
                        )
                    fields = dict(
                        ln.split(": ", 1) for ln in lines[1:] if ": " in ln
                    )
                    clen = int(fields["Content-Length"])
                    start = hdr_end + len(_RECORD_SEP)
                    if start + clen > len(b):
                        break  # truncated trailing record: drop
                    payload = b[start : start + clen]
                    pos = start + clen + len(_RECORD_SEP)
                    if fields.get("WARC-Type", "") != "response":
                        continue  # length consumed above — walk stays framed
                    http_end = payload.find(_RECORD_SEP)
                    if http_end >= 0 and payload[:5] in (b"HTTP/",):
                        head = payload[:http_end].decode(
                            "utf-8", errors="replace"
                        )
                        body = payload[http_end + len(_RECORD_SEP):]
                        head_lines = head.split("\r\n")
                        parts = head_lines[0].split(" ")
                        st = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
                        hfields = dict(
                            ln.split(": ", 1)
                            for ln in head_lines[1:]
                            if ": " in ln
                        )
                        ct = hfields.get("Content-Type", "")
                    else:
                        st, ct, body = 0, "", payload
                    uris.append(fields.get("WARC-Target-URI", ""))
                    stats.append(st)
                    ctypes.append(ct)
                    lens.append(len(body))
                    htmls.append(body.decode("utf-8", errors="replace"))
            yield pd.DataFrame(
                {
                    "target_uri": uris,
                    "http_status": stats,
                    "content_type": ctypes,
                    "n_bytes": lens,
                    "html": htmls,
                }
            )

    return shards.mapInPandas(
        kernel,
        "target_uri string, http_status int, content_type string, "
        "n_bytes long, html string",
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse every WARC shard file under ``path`` (glob ok): one
    ``binaryFile`` row per shard — one task per shard file — piped
    through :func:`parse_warc`."""
    files = spark.read.format("binaryFile").load(path)
    return parse_warc(files, content_col="content")
