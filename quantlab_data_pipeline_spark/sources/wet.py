"""WET (WARC conversion) corpus codec — the Common Crawl text format
that real LLM data pipelines ingest.

A WET shard is a byte stream of records, each a ``WARC/1.0`` header
block (``WARC-Type: conversion``, ``WARC-Target-URI``,
``Content-Length``) terminated by a blank line, followed by exactly
``Content-Length`` payload bytes and a blank-line separator. Parsing is
genuinely imperative byte walking (Content-Length framing — you cannot
split on markers, the payload may contain them), so it rides the same
Arrow-batched ``mapInPandas`` path as the PNG/WAV codecs; everything
around it (sharding, ordering, joins) stays Catalyst.

Scale shape: one shard file = one task on read (``binaryFile`` rows
carry whole shards) — exactly how Common Crawl distributes (tens of
thousands of ~150 MB WET files). The parse kernel is streaming within
a shard and the output is narrow (uri, n_bytes, text); downstream
filters/dedup operate on the parsed frame. Encode is ``applyInPandas``
per shard key so each shard's bytes are assembled exactly once, in a
deterministic (shard, id) order.

No gzip here deliberately: Spark's ``binaryFile`` reads the compressed
shard as-is and Python's ``gzip`` could wrap the kernel, but the
container's testdata is uncompressed and the framing logic — the part
worth testing — is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["wet_encode", "parse_wet", "read_wet"]

_RECORD_SEP = b"\r\n\r\n"


def wet_encode(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 4,
) -> DataFrame:
    """(shard_id, content): the corpus serialized into ``shards`` WET
    byte streams — shard = id mod ``shards``, records in ascending id
    order within a shard, so the encoding is deterministic and
    engine-replayable. Null text encodes as an empty payload (the
    format has no null; Content-Length: 0)."""
    base = docs.select(
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("__shard"),
        F.col(id_col).cast("long").alias("__id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id")
        buf = bytearray()
        for _, r in pdf.iterrows():
            payload = str(r["__text"]).encode("utf-8")
            header = (
                "WARC/1.0\r\n"
                "WARC-Type: conversion\r\n"
                f"WARC-Target-URI: doc://{int(r['__id'])}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("ascii")
            buf += header + payload + _RECORD_SEP
        return pd.DataFrame(
            {"shard_id": [int(pdf["__shard"].iloc[0])], "content": [bytes(buf)]}
        )

    return base.groupBy("__shard").applyInPandas(
        assemble, "shard_id int, content binary"
    )


def parse_wet(shards: DataFrame, content_col: str = "content") -> DataFrame:
    """(target_uri, n_bytes, text) per record across all shard blobs.

    Content-Length framing: the payload is sliced by byte count, never
    by searching for the record separator, so payloads containing
    ``WARC/1.0`` or blank lines round-trip intact. A truncated trailing
    record (header promises more bytes than remain) is dropped — the
    standard lenient posture for crawl data — but a malformed HEADER
    block raises, because silently skipping unparseable framing would
    desynchronize the walk and mis-frame every later record."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uris: list[str] = []
            lens: list[int] = []
            texts: list[str] = []
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
                    uris.append(fields.get("WARC-Target-URI", ""))
                    lens.append(clen)
                    texts.append(b[start : start + clen].decode("utf-8"))
                    pos = start + clen + len(_RECORD_SEP)
            yield pd.DataFrame(
                {"target_uri": uris, "n_bytes": lens, "text": texts}
            )

    return shards.mapInPandas(
        kernel, "target_uri string, n_bytes long, text string"
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Parse every WET shard file under ``path`` (glob ok): one
    ``binaryFile`` row per shard file — one task per shard, the Common
    Crawl distribution unit — piped through :func:`parse_wet`."""
    files = spark.read.format("binaryFile").load(path)
    return parse_wet(files, content_col="content")
