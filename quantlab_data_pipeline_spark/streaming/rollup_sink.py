"""Streaming materialized-rollup maintenance (foreachBatch sink).

Completes the rollup story: :mod:`..storage.rollup` gives batch build +
additive refresh; this wires an event STREAM into the same store, so
the rollup becomes a continuously-maintained materialized view. The
sink is ``foreachBatch`` — the standard Structured Streaming pattern
for sinks that need batch-only operations (here: dynamic partition
overwrite of the touched grain partitions), with exactly-once refresh
per micro-batch under the checkpoint's batch-id tracking as long as
the refresh itself is idempotent per batch id.

Idempotency caveat, stated plainly: ``refresh_rollup`` is additive, so
a micro-batch REPLAYED after a crash-between-commit would double-count.
The sink therefore records the last applied batch id inside the store
(``_applied_batch`` subdirectory, one row) and skips batches it has
already folded in — the same ledger trick a warehouse MERGE would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import is_dir
from ..localframe import local_df
from ..storage.rollup import refresh_rollup

__all__ = ["rollup_sink", "last_applied_batch"]


def last_applied_batch(spark: SparkSession, path: str) -> int:
    """Highest micro-batch id already folded into the store (-1 if
    none)."""
    try:
        rows = spark.read.parquet(f"{path}/_applied_batch").collect()
    except Exception:  # noqa: BLE001 — first batch: ledger doesn't exist yet
        return -1
    return max((int(r["batch_id"]) for r in rows), default=-1)


def rollup_sink(
    path: str,
    time_col: str,
    dims: list[str],
    value_col: str,
    grain: str = "day",
):
    """A ``foreachBatch`` function maintaining the rollup at ``path``.

    Usage::

        q = (events_stream.writeStream
             .foreachBatch(rollup_sink(path, "ts", ["event_type"], "value"))
             .option("checkpointLocation", ckpt)
             .start())
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id <= last_applied_batch(spark, path):
            return  # replayed batch: already folded in, skip (idempotent)
        if batch_df.isEmpty():
            return
        if not is_dir(spark, path):
            # First data: build via an empty-store refresh (refresh with
            # no existing partitions is exactly a build).
            from ..storage.rollup import build_rollup

            build_rollup(batch_df, path, time_col, dims, value_col, grain)
        else:
            refresh_rollup(batch_df, path, time_col, dims, value_col, grain)
        local_df(
            spark, [(int(batch_id),)], "batch_id long"
        ).coalesce(1).write.mode("append").parquet(f"{path}/_applied_batch")

    return _apply
