"""Structured Streaming over the events table — beyond-parity
capability (the reference is strictly batch, SURVEY §2.9).

The batch twin of ``windowed_aggregate`` is ``queries.hourly_rollup``,
which is what the DuckDB oracle checks; here the same logical plan runs
incrementally with watermarked state eviction.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The events parquet has shipped with both TIMESTAMP(NANOS) — which
# arrives as a long under nanosAsLong — and plain TIMESTAMP(MICROS)
# encodings. The stream source must declare its schema up front, so a
# one-off batch probe of the footer decides which variant to use (same
# adaptive normalization as sources.testdata.load_table).
def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


EVENTS_RAW_SCHEMA = _events_schema(T.LongType())


def _as_stream_dir(path: str) -> str:
    """Spark's file streaming source requires a *directory* basePath; the
    testdata ships single .parquet files. Stage a symlink in a temp dir.
    Non-local URIs (hdfs://, s3a://) are returned as-is — the symlink
    staging is a local-testdata convenience only."""
    if "://" in path and not path.startswith("file:"):
        return path
    if os.path.isdir(path):
        return path
    d = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(path, os.path.join(d, os.path.basename(path)))
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file-source streaming: each
    file is a micro-batch; in production this would be Kafka/queue)."""
    path = f"{sf_dir}/events.parquet"
    # Footer-only batch probe: is ts a nanos-long or a real timestamp?
    ts_is_long = dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"
    schema = _events_schema(T.LongType() if ts_is_long else T.TimestampType())
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_as_stream_dir(path))
    )
    if ts_is_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def windowed_aggregate(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding window counts + sums with late-data watermark."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def ohlc_bars_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming hourly OHLC bars per user — the incremental twin of
    ``queries_ext.ohlc_bars``. Open/close are lexicographic struct
    min/max over (ts, event_id, value), which are plain aggregate
    functions and therefore stream-safe: late ticks inside the
    watermark still update the bar's open/close correctly, something a
    first()/last()-style implementation cannot guarantee under
    out-of-order arrival."""
    s = F.struct("ts", "event_id", "value")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "user_id")
        .agg(
            F.round(F.min(s)["value"], 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max(s)["value"], 2).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("bar_ts"),
            "user_id",
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` idle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def clicks_with_recent_purchase(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream self-join: each click pairs with the same user's
    purchases from the preceding ``lookback``.

    Both branches carry watermarks and the join has an explicit event-
    time range constraint — that bounds the join state Spark must keep
    (purchases older than click watermark + lookback are evicted).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return clicks.join(purchases, cond, "inner").select(
        "click_id", "user_id", "click_ts", "purchase_ts", "purchase_value"
    )


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming query to completion against a memory sink
    (file-source streams are finite, so processAllAvailable terminates).
    Returns the materialized result as a batch DataFrame."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def enrich_with_static_dim(
    stream: DataFrame, dim: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """Stream-static join: every micro-batch joins against the CURRENT
    state of a static/batch dimension — the standard enrichment for
    slowly-refreshed reference data (user profiles, symbol masters).

    Completes the streaming join surface next to the watermarked
    stream-stream join (clicks_with_recent_purchase) and the stateful
    latest-value as-of (streaming/asof.py): unlike those, this needs
    NO state store at all — Spark re-plans the dim side per micro-batch,
    so a broadcast-sized dim costs one broadcast per batch and a parquet
    -backed dim is re-scanned (pointing it at a path picks up refreshes
    between batches). Stream side must be the left/outer side — Spark
    rejects shapes that would need unbounded stream buffering.
    """
    return stream.join(dim, on, how)
