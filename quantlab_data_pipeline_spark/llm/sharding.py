"""Deterministic size-balanced output sharding + shard manifests.

The last mile of a 100 TB curation run is never "one parquet
directory": training infrastructure consumes the corpus as a list of
roughly-equal shards (WebDataset tars, Megatron .bin chunks, TFRecord
files), and the writer must answer three questions deterministically —
which shard does each document land in, is every shard close to the
target size, and how does a reader verify a shard it downloaded is the
shard the manifest promised. This module answers all three with the
repo's skew-safe primitives:

- :func:`shard_assign` — contiguous first-fit binning over a caller
  supplied TOTAL order: global running total of the byte column via
  ``grouped_global_cumsum`` (range partition + local cumsum +
  broadcast offsets — no single task ever sees the corpus), then
  ``shard = prefix_bytes_before div target_bytes``. Contiguous binning
  over a prefix sum is the classic bound: every shard's payload is
  < ``target_bytes`` + the largest single document, and the assignment
  is a pure function of the order and the byte column — re-running the
  job on a re-partitioned cluster yields byte-identical shards.
- :func:`shard_manifest` — one row per shard: doc count, payload
  bytes, id range, and an ORDER-INSENSITIVE content fingerprint
  (``bit_xor`` of a 60-bit md5 slice per document), so a reader can
  verify a shard without caring what order the writer's tasks emitted
  rows in. XOR is the right aggregate here precisely because it is
  commutative and cancels duplicates loudly (a doubled row flips the
  fingerprint, it doesn't hide).
- :func:`compaction_plan` — the maintenance half: given a manifest
  (metadata scale — ~200k rows for 100 TB at 512 MB shards), mark
  undersized shards and greedily merge RUNS of them into
  target-sized groups with the same prefix-sum binning, so compaction
  moves only small shards and never rewrites a healthy one.

Everything is exact integer arithmetic on BIGINTs (``div``, not
float division; md5-derived hashes, not engine-local ones), so the
whole assignment→manifest→plan chain replays bit-for-bit in DuckDB —
which is how the registry rows oracle it.

Reference parity: the reference engine writes single parquet outputs
per dataset (``/root/reference/src/data_pipeline/storage/
parquet_handler.py``); sharded output layout is beyond-parity scale
surface, same family as ``llm/mixing.py``'s token-budget fill (both
are "deterministic plan over a global prefix sum").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FP_BITS_HEX = 15  # 60-bit slice: XOR-closed, fits BIGINT in any engine


def content_fingerprint(col: Column) -> Column:
    """60-bit md5 slice of a string column — the per-document term of
    the order-insensitive shard fingerprint. 15 hex chars < 2^60, so
    the value (and any XOR of such values) is a non-negative BIGINT in
    Spark and an exact UBIGINT→BIGINT in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, _FP_BITS_HEX), 16, 10).cast(
        "long"
    )


def shard_assign(
    df: DataFrame,
    bytes_col: str,
    target_bytes: int,
    order_cols: list,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Assign every row to a shard by contiguous first-fit binning of
    the global byte prefix sum over ``order_cols``.

    ``order_cols`` must be a TOTAL order (include a unique id as the
    final tie-break) — same contract as ``grouped_global_rank``; a
    non-total order makes the prefix sum, and therefore the shard ids,
    partition-dependent. ``bytes_col`` must be non-null and
    non-negative (coalesce upstream; a null byte count has no
    meaningful bin).

    Returns ``df`` plus ``shard_col`` (0-based BIGINT). Guarantee:
    each shard's total payload < ``target_bytes`` + max single row,
    and at most one shard (the last) is underfull by more than the
    largest row. Scale shape: one range exchange + one tiny offsets
    broadcast (the ``grouped_global_cumsum`` machinery); no task ever
    holds more than ~|df|/partitions rows.
    """
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    from ..operators.skew import grouped_global_cumsum

    tagged = df.withColumn("__g", F.lit(0))
    summed = grouped_global_cumsum(
        tagged,
        ["__g"],
        order_cols,
        bytes_col,
        cumsum_col="__cum_bytes",
    )
    return summed.withColumn(
        shard_col,
        F.expr(
            f"(__cum_bytes - {bytes_col}) div {int(target_bytes)}"
        ).cast("long"),
    ).drop("__g", "__cum_bytes")


def shard_manifest(
    assigned: DataFrame,
    fp_col: Column,
    bytes_col: str,
    id_col: str = "doc_id",
    shard_col: str = "shard_id",
) -> DataFrame:
    """One manifest row per shard: ``(shard_col, n_docs, total_bytes,
    min_id, max_id, content_fp)``.

    ``fp_col`` is the per-document fingerprint term (use
    :func:`content_fingerprint` over the payload column); the shard
    fingerprint is the XOR-fold of the terms, so it is independent of
    row order AND of how the aggregation was partitioned — two
    properties a concatenation-hash does not have. One hash exchange
    on the shard key; the manifest is metadata-sized output.
    """
    return assigned.groupBy(shard_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(bytes_col).cast("long").alias("total_bytes"),
        F.min(id_col).cast("long").alias("min_id"),
        F.max(id_col).cast("long").alias("max_id"),
        F.bit_xor(fp_col).alias("content_fp"),
    )


def compaction_plan(
    manifest: DataFrame,
    target_bytes: int,
    min_bytes: int,
    bytes_col: str = "total_bytes",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Plan a compaction pass over a shard manifest: shards with
    ``bytes_col`` >= ``min_bytes`` are healthy (action ``keep``,
    ``merge_group`` null); undersized shards are binned — in shard-id
    order, by the same prefix-sum first-fit as :func:`shard_assign` —
    into merge groups of ~``target_bytes`` (action ``merge``;
    ``merge_group`` is the 0-based group id).

    Only undersized shards ever move: a compactor executing the plan
    rewrites ``sum(small shard bytes)`` bytes total, never a healthy
    shard. The manifest is metadata-sized but the same skew-safe
    cumsum is used anyway — a 100 TB corpus at aggressive shard sizes
    is millions of manifest rows, and the primitive costs nothing
    extra at small counts.
    """
    if min_bytes > target_bytes:
        raise ValueError(
            f"min_bytes ({min_bytes}) must be <= target_bytes ({target_bytes})"
        )
    small = manifest.filter(F.col(bytes_col) < min_bytes)
    binned = shard_assign(
        small,
        bytes_col,
        target_bytes,
        [F.col(shard_col).asc()],
        shard_col="__merge_group",
    )
    merged = binned.select(
        shard_col,
        F.col(bytes_col),
        F.lit("merge").alias("action"),
        F.col("__merge_group").cast("long").alias("merge_group"),
    )
    kept = manifest.filter(F.col(bytes_col) >= min_bytes).select(
        shard_col,
        F.col(bytes_col),
        F.lit("keep").alias("action"),
        F.lit(None).cast("long").alias("merge_group"),
    )
    return kept.unionByName(merged)
