"""WET corpus codec tests: framing, unicode, disk reads, lenient vs
strict error posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.sources.wet import (
    parse_wet,
    read_wet,
    wet_encode,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_roundtrip_with_adversarial_payloads(spark):
    """Payloads containing the record separator, WARC magic, and
    multi-byte unicode must round-trip byte-exact (Content-Length
    framing, not marker splitting)."""
    rows = [
        (0, "plain text"),
        (1, "embedded\r\n\r\nseparator and WARC/1.0 magic"),
        (2, "unicode: 你好 — café \U0001f600"),
        (3, ""),
        (4, None),
    ]
    parsed = parse_wet(wet_encode(_docs(spark, rows), shards=2))
    got = {
        int(r["target_uri"].rsplit("/", 1)[-1]): (r["text"], r["n_bytes"])
        for r in parsed.collect()
    }
    for i, t in rows:
        expect = t or ""
        assert got[i][0] == expect
        assert got[i][1] == len(expect.encode("utf-8"))


def test_read_wet_from_disk(spark, tmp_path):
    """One binaryFile row per shard file; records parse across files."""
    rows = [(i, f"doc number {i}") for i in range(10)]
    shards = wet_encode(_docs(spark, rows), shards=3).collect()
    for r in shards:
        (tmp_path / f"shard-{r['shard_id']}.warc.wet").write_bytes(
            bytes(r["content"])
        )
    parsed = read_wet(spark, str(tmp_path / "*.wet"))
    assert parsed.count() == 10
    assert {
        int(r["target_uri"].rsplit("/", 1)[-1]) for r in parsed.collect()
    } == set(range(10))


def test_truncated_trailing_record_dropped(spark):
    full = bytes(
        wet_encode(_docs(spark, [(0, "keep me"), (1, "cut me")]), shards=1)
        .collect()[0]["content"]
    )
    truncated = full[:-6]  # cut into the last payload
    df = spark.createDataFrame([(truncated,)], "content binary")
    out = parse_wet(df).collect()
    assert [r["text"] for r in out] == ["keep me"]


def test_malformed_header_raises(spark):
    df = spark.createDataFrame(
        [(b"NOT-WARC\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n",)],
        "content binary",
    )
    with pytest.raises(Exception, match="WARC"):
        parse_wet(df).collect()


def test_shard_assignment_is_deterministic(spark):
    rows = [(i, f"t{i}") for i in range(20)]
    enc = wet_encode(_docs(spark, rows), shards=4)
    a = {r["shard_id"]: bytes(r["content"]) for r in enc.collect()}
    b = {
        r["shard_id"]: bytes(r["content"])
        for r in wet_encode(
            _docs(spark, rows).repartition(7), shards=4
        ).collect()
    }
    assert a == b  # byte-identical regardless of input partitioning
