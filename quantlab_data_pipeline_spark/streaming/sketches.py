"""Streaming sketch aggregation: windowed distinct counts via HLL.

Exact streaming COUNT DISTINCT needs per-key state proportional to the
number of distinct ids seen — unbounded on a 100 TB/day firehose. A
datasketches HLL cell per (window, dims) keeps the state at a few KB
per group with ~1-2% error, and the sketch column itself can be SUNK
(e.g. by ``foreachBatch`` into the same hive layout as
``storage.rollup.build_distinct_rollup``), so the streaming path and
the batch rollup share one mergeable representation: union the stored
cells across any window mix — some written by the stream, some by
backfill — and estimate once.

``hll_sketch_agg`` is a full AggregateFunction, so Structured Streaming
maintains the sketch incrementally in the state store like any
count/sum — no custom stateful operator needed; the watermark bounds
how long a window's sketch stays in state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_distinct_sketch", "windowed_distinct_estimate"]


def windowed_distinct_sketch(
    events: DataFrame,
    id_col: str = "user_id",
    dims: list[str] | None = None,
    window: str = "1 hour",
    watermark: str = "2 hours",
    lgk: int = 12,
) -> DataFrame:
    """(window_start, window_end, dims..., sketch): one mergeable HLL
    binary per (window, dims) cell, maintained incrementally in the
    streaming state store. Works identically on a batch frame (the
    batch-twin tests rely on that)."""
    dims = dims or ["event_type"]
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), *dims)
        .agg(
            F.hll_sketch_agg(F.col(id_col).cast("string"), F.lit(lgk)).alias(
                "sketch"
            )
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *dims,
            "sketch",
        )
    )


def windowed_distinct_estimate(cells: DataFrame, dims: list[str] | None = None) -> DataFrame:
    """Collapse sketch cells to (dims..., n_distinct) across ALL
    windows present — the read-side union+estimate, identical to
    ``storage.rollup.estimate_distinct`` so stream-written and
    batch-written cells interoperate."""
    dims = dims or ["event_type"]
    return cells.groupBy(*dims).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct")
    )
