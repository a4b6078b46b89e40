"""Small-file compaction: the table-maintenance pass every long-lived
100 TB dataset needs.

Incremental refresh (``update_facts``), streaming sinks, and
per-task writes all accumulate files far below the ideal scan unit;
at scale the resulting per-file open/footer overhead and tiny row
groups dominate read cost long before data volume does. ``compact_table``
rewrites a parquet dataset into ~``target_mb``-sized files — sized from
the dataset's real on-disk bytes, not a guessed partition count — with
optional range-clustering so footer min/max stats stay selective.

Crash-safety model: new files land in a temporary sibling and the
original directory is only touched after the rewrite fully succeeds,
so a failure during the (expensive) write leaves the dataset exactly
as it was. The swap itself is two renames — NOT atomic: a crash
between them leaves the data under ``<name>.__compact_old`` (recover
by renaming back), and a concurrent scan that listed files before the
swap can fail mid-read. Run compaction as the dataset's only writer
with readers drained — the normal discipline for a maintenance window.
(On an object store or lakehouse table the same routine would target
an atomic manifest/catalog swap instead.)
"""

from __future__ import annotations

import math
import shutil
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import SparkSession


def _local_path(uri: str) -> Path:
    p = urlparse(uri)
    return Path(p.path if p.scheme in ("file", "") else uri)


def dataset_bytes(spark: SparkSession, path: str | Path) -> tuple[int, int]:
    """(total bytes, file count) of a parquet dataset's data files."""
    files = spark.read.parquet(str(path)).inputFiles()
    total = sum(_local_path(f).stat().st_size for f in files)
    return total, len(files)


def compact_table(
    spark: SparkSession,
    path: str | Path,
    target_mb: int = 256,
    sort_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet dataset into ~``target_mb``-sized files.

    ``sort_by`` range-clusters the rewrite (keeps footer min/max stats
    selective for data skipping — pair with the read side's filter
    columns). ``partition_by`` preserves a hive-partitioned layout
    (each partition's files are compacted into that partition's
    directory). Returns a report dict with before/after file counts
    and bytes.

    Scale shape: one full read + write of the dataset — that is the
    definition of compaction — with the output width chosen from
    measured input bytes (compressed), never a fixed partition count
    that would produce shards 100x too big at 100 TB or too small at
    test scale. A crash during the write leaves the original dataset
    untouched; see the module docstring for the (non-atomic) swap's
    crash-recovery and single-writer requirements.
    """
    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    src = Path(path)
    if not src.exists():
        raise FileNotFoundError(str(src))
    total, n_before = dataset_bytes(spark, src)
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(str(src))
    # Partition columns lead the clustering keys so each output task
    # holds one hive partition's rows (repartition(n) alone would make
    # every task write a sliver into every partition directory —
    # tasks x partitions files, the problem compaction exists to fix).
    keys = [*(partition_by or []), *(sort_by or [])]
    if keys:
        out = df.repartitionByRange(n_files, *keys).sortWithinPartitions(*keys)
    else:
        out = df.repartition(n_files)

    tmp = src.with_name(src.name + ".__compact_tmp")
    old = src.with_name(src.name + ".__compact_old")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(tmp))

    # Swap only after a complete successful write.
    src.rename(old)
    tmp.rename(src)
    shutil.rmtree(old)
    total_after, n_after = dataset_bytes(spark, src)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": total,
        "bytes_after": total_after,
        "target_files": n_files,
    }
