"""Persistent perceptual-fingerprint index — incremental media dedup.

The media twin of :mod:`.dedup_index` (MinHash text index): a crawl
ingests image/audio batches continuously, and re-fingerprinting or
re-shuffling the whole already-accepted corpus per batch is the cost
this index removes. Stored layout at ``path``:

* ``fingerprints/`` — (asset_id, fp) parquet: 8 bytes per asset plus
  the id; the pixels/samples NEVER enter the index.
* ``buckets`` — (asset_id, band_idx, band_val) as a Hive-bucketed
  table on (band_idx, band_val) (``bucket_n`` buckets): a probe batch
  shuffles ITSELF into the stored bucketing and the corpus side reads
  in place — no corpus-wide exchange per batch (same exchange-saving
  layout the text index measured: the gap grows with index size).
* ``meta`` — (modality, max_hamming, bands, bucket_n) pinned at build
  time so callers cannot drift the band structure between batches.

Banding follows ``dedup.simhash_near_dup_pairs``: ``bands`` defaults
to the pigeonhole minimum ``max_hamming + 1`` (recall exact, widest —
most selective — band values; see the round-7 probe numbers in
BASELINE.md). The typical intake loop is
``flag_new_media -> keep !is_dup -> append_to_media_index``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..fsutil import delete_path as _delete_path
from ..localframe import local_df
from ..fsutil import path_exists as _path_exists

__all__ = [
    "build_media_index",
    "append_to_media_index",
    "query_media_index",
    "flag_new_media",
    "remove_from_media_index",
    "compact_media_index",
]

_FINGERPRINTERS = {"image": "image_dhash", "audio": "audio_fingerprint"}


def _fingerprint(media: DataFrame, modality: str) -> DataFrame:
    """(asset_id, fp) via the modality's Arrow kernel."""
    from . import multimodal

    if modality not in _FINGERPRINTERS:
        raise ValueError(f"unknown modality {modality!r}")
    fp = getattr(multimodal, _FINGERPRINTERS[modality])(media)
    return fp.select("asset_id", F.col(fp.columns[1]).alias("fp"))


def _bands(fp_df: DataFrame, bands: int, keep_fp: bool = False) -> DataFrame:
    """(asset_id, band_idx, band_val) — bit-band explode of the 64-bit
    fingerprint, identical construction to simhash_near_dup_pairs.
    ``keep_fp`` carries the 8-byte fingerprint through the band rows
    (query path: the probe batch is then scanned ONCE — the exact
    Hamming check reads ``fp`` off the band row instead of joining the
    fingerprint frame back, so no persist/cache lifecycle exists on
    the probe side at all)."""
    width = 64 // bands
    # Signed-64 view of the low-`width` ones-mask: at bands=1 the band
    # is the whole fingerprint and (1 << 64) - 1 overflows a Java long,
    # but its two's-complement value -1 is the same 64 set bits.
    m = (1 << width) - 1
    mask = F.lit(m - (1 << 64) if m >= 1 << 63 else m).cast("long")
    band = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band_idx"),
                    F.shiftrightunsigned(F.col("fp"), i * width)
                    .bitwiseAND(mask)
                    .alias("band_val"),
                )
                for i in range(bands)
            ]
        )
    )
    head = ["asset_id", "fp"] if keep_fp else ["asset_id"]
    return fp_df.select(*head, band.alias("b")).select(
        *head, "b.band_idx", "b.band_val"
    )



def _tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    """Logically-removed asset ids, or None when nothing was removed."""
    if _path_exists(spark, f"{path}/tombstones"):
        return spark.read.parquet(f"{path}/tombstones")
    return None


def _bucket_table_name(path: str) -> str:
    return "media_idx_" + hashlib.md5(path.encode()).hexdigest()[:12]


def _register_bucketed(spark: SparkSession, path: str, bucket_n: int) -> DataFrame:
    name = _bucket_table_name(path)
    if not spark.catalog.tableExists(name):
        # SORTED BY must match the writer's sortBy or Spark rejects
        # appended buckets as a different layout
        spark.sql(
            f"CREATE TABLE {name} (asset_id BIGINT, band_idx INT, "
            f"band_val BIGINT) USING parquet "
            f"CLUSTERED BY (band_idx, band_val) "
            f"SORTED BY (band_idx, band_val) INTO {bucket_n} BUCKETS "
            f"LOCATION '{path}/buckets'"
        )
    return spark.table(name)


def build_media_index(
    media: DataFrame,
    path: str,
    modality: str = "image",
    max_hamming: int = 6,
    bands: int | None = None,
    bucket_n: int = 8,
    precomputed_fp: DataFrame | None = None,
) -> None:
    """Create the index at ``path`` from the current corpus (overwrite).

    ``precomputed_fp`` — an already-MATERIALIZED (persisted or
    localCheckpointed) (asset_id, fp) frame for exactly ``media``'s
    assets — skips the decode+fingerprint pass entirely (guide §1.2:
    don't recompute what a caller already holds; the intake sink
    fingerprints each batch once and reuses the 16-byte rows for flag,
    winner, and append). The caller owns materialization; an
    un-materialized frame would be evaluated once per write below.
    """
    spark = media.sparkSession
    if bands is None:
        bands = max_hamming + 1
    if bands < max_hamming + 1:
        raise ValueError(
            f"bands={bands} breaks pigeonhole recall for "
            f"max_hamming={max_hamming}"
        )
    fp = (
        precomputed_fp
        if precomputed_fp is not None
        else _fingerprint(media, modality).persist()
    )
    try:
        # AQE-rebalanced writes (guide §6 — small files hurt twice):
        # without the hint every upstream partition writes its own
        # fingerprint file and one file PER BUCKET it touches in the
        # band table (32 partitions x 8 buckets = 256 files per
        # batch-sized append; every subsequent flag re-lists and
        # re-opens all of them). Rebalance sizes the write to the
        # data: a small batch collapses to one task (1 fingerprint
        # file, bucket_n band files), a huge build splits at AQE's
        # advisory size — scale-adaptive, not a local[32] constant.
        fp.hint("rebalance").write.mode("overwrite").parquet(
            f"{path}/fingerprints"
        )
        name = _bucket_table_name(path)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # The bucket table is EXTERNAL (CREATE ... LOCATION), so DROP
        # TABLE leaves the files: clear the directory or a rebuild at
        # an existing path appends fresh band rows on top of stale
        # ones and the candidate set grows across rebuilds (ADVICE r7).
        _delete_path(spark, f"{path}/buckets")
        # A rebuild is a fresh corpus: tombstones from the path's
        # previous life must not mask the new assets.
        _delete_path(spark, f"{path}/tombstones")
        _register_bucketed(spark, path, bucket_n)
        (
            _bands(fp, bands)
            .hint("rebalance", "band_idx", "band_val")
            .write.mode("append")
            .format("parquet")
            .bucketBy(bucket_n, "band_idx", "band_val")
            .sortBy("band_idx", "band_val")
            .saveAsTable(name)
        )
    finally:
        if precomputed_fp is None:
            fp.unpersist()
    local_df(
        spark,
        [(modality, max_hamming, bands, bucket_n)],
        "modality string, max_hamming int, bands int, bucket_n int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def _read_meta(spark: SparkSession, path: str) -> tuple[str, int, int, int]:
    r = spark.read.parquet(f"{path}/meta").collect()[0]
    return r["modality"], int(r["max_hamming"]), int(r["bands"]), int(r["bucket_n"])


def append_to_media_index(
    media: DataFrame, path: str, precomputed_fp: DataFrame | None = None
) -> None:
    """Add an accepted batch with the build-time band structure.

    Write order is load-bearing: BANDS first, fingerprints last. An
    intake caller naturally derives ``media`` from a read of
    ``{path}/fingerprints`` (e.g. anti-joining a batch against what is
    already indexed), and Spark re-caches cached plans that read a
    path the moment that path is appended to — so if fingerprints
    were written first, the bands action would re-evaluate ``media``
    against the POST-append file list and silently drop every asset
    it just admitted. With the self-referential write last, both
    actions see the pre-append index.

    ``precomputed_fp`` (optional): a (asset_id, fp) frame for exactly
    the batch's assets, computed by a caller that already paid the
    decode+fingerprint pass (the intake sink). It is localCheckpointed
    here regardless — the freeze below is this function's invariant,
    not the caller's. With ``precomputed_fp``, ``media`` may be None
    (nothing else is read from it)."""
    spark = (media if precomputed_fp is None else precomputed_fp).sparkSession
    modality, _mh, bands, bucket_n = _read_meta(spark, path)
    # localCheckpoint, not persist: persist is NOT a freeze — Spark
    # re-caches (re-executes) cached plans whose input paths are
    # written to, so a persisted frame whose lineage reads this index
    # would silently flip under the second write. Checkpointed blocks
    # have no lineage to re-execute. Batch-sized, so the
    # materialization is cheap; blocks are freed when the frame is
    # garbage-collected.
    fp = (
        precomputed_fp
        if precomputed_fp is not None
        else _fingerprint(media, modality)
    ).localCheckpoint()
    _register_bucketed(spark, path, bucket_n)  # fresh-session safe
    # Rebalance both appends (see build_media_index): an un-hinted
    # batch append writes partitions x buckets tiny band files that
    # every later flag pays to list and open.
    (
        _bands(fp, bands)
        .hint("rebalance", "band_idx", "band_val")
        .write.mode("append")
        .format("parquet")
        .bucketBy(bucket_n, "band_idx", "band_val")
        .sortBy("band_idx", "band_val")
        .saveAsTable(_bucket_table_name(path))
    )
    fp.hint("rebalance").write.mode("append").parquet(f"{path}/fingerprints")


def query_media_index(
    new_media: DataFrame, path: str, precomputed_fp: DataFrame | None = None
) -> DataFrame:
    """(new_id, indexed_id, hamming) for every probe asset within the
    index's ``max_hamming`` of a stored fingerprint. Candidates come
    from the banded equi-join against the bucketed layout (pigeonhole-
    exact recall); only the candidate pairs' 8-byte fingerprints enter
    the exact Hamming check. The probe fingerprint rides the band rows
    (``keep_fp`` — 8 extra bytes per band row), so the probe batch is
    decoded and fingerprinted exactly once per action with NO cached
    state left behind (the r7 ``persist`` leak is gone by design: the
    second probe-side join it was caching no longer exists).

    ``precomputed_fp``: a materialized (asset_id, fp) frame for the
    probe batch, for callers that already fingerprinted it (the intake
    sink) — skips the decode+hash entirely."""
    spark = (new_media if precomputed_fp is None else precomputed_fp).sparkSession
    modality, max_hamming, bands, bucket_n = _read_meta(spark, path)
    new_fp = (
        precomputed_fp
        if precomputed_fp is not None
        else _fingerprint(new_media, modality)
    )
    idx_buckets = _register_bucketed(spark, path, bucket_n)
    idx_fp = spark.read.parquet(f"{path}/fingerprints")
    ts = _tombstones(spark, path)
    if ts is not None:
        # Anti-joining the fingerprint frame alone suffices: a
        # tombstoned id's surviving BUCKET rows drop out of the
        # candidate set at the fingerprint inner join below — the same
        # mechanism that makes stale band rows harmless on rebuild.
        idx_fp = idx_fp.join(
            ts.select("asset_id").distinct(), "asset_id", "left_anti"
        )
    candidates = (
        _bands(new_fp, bands, keep_fp=True)
        .select(
            F.col("asset_id").alias("new_id"),
            F.col("fp").alias("fa"),
            "band_idx",
            "band_val",
        )
        .join(
            idx_buckets.select(
                F.col("asset_id").alias("indexed_id"), "band_idx", "band_val"
            ),
            ["band_idx", "band_val"],
        )
        # fa is functionally dependent on new_id, so carrying it through
        # the distinct leaves the candidate cardinality unchanged.
        .select("new_id", "fa", "indexed_id")
        .distinct()
    )
    return (
        candidates.join(
            idx_fp.select(
                F.col("asset_id").alias("indexed_id"), F.col("fp").alias("fb")
            ),
            "indexed_id",
        )
        .withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("new_id", "indexed_id", "hamming")
    )


def flag_new_media(
    new_media: DataFrame, path: str, precomputed_fp: DataFrame | None = None
) -> DataFrame:
    """Annotate a probe batch: (asset_id, is_dup, best_match_id,
    best_hamming, n_matches) — best match = lowest hamming, then lowest
    indexed id (deterministic). ``precomputed_fp`` as in
    :func:`query_media_index`; the asset universe is then read off the
    fingerprint frame (1:1 with the batch), so the media frame is never
    touched at all."""
    pairs = query_media_index(new_media, path, precomputed_fp=precomputed_fp)
    best = (
        pairs.groupBy("new_id")
        .agg(
            F.min(F.struct("hamming", "indexed_id")).alias("__b"),
            F.count("*").alias("n_matches"),
        )
        .select(
            "new_id",
            F.col("__b.indexed_id").alias("best_match_id"),
            F.col("__b.hamming").alias("best_hamming"),
            "n_matches",
        )
    )
    ids = (
        new_media if precomputed_fp is None else precomputed_fp
    ).select("asset_id").distinct()
    return (
        ids.join(best, ids["asset_id"] == best["new_id"], "left")
        .drop("new_id")
        .select(
            "asset_id",
            F.col("best_match_id").isNotNull().alias("is_dup"),
            "best_match_id",
            "best_hamming",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
        )
    )


def remove_from_media_index(spark: SparkSession, path: str, asset_ids) -> None:
    """Takedown: logically remove indexed assets by id.

    Appends the ids to ``{path}/tombstones`` — an O(delete-set) write;
    the corpus-sized fingerprint and bucket stores are untouched.
    Every subsequent query anti-joins the tombstone set, so removed
    assets stop matching immediately; :func:`compact_media_index`
    later rewrites the stores to reclaim the space. Contract: ids are
    permanent asset identities — a tombstoned id stays masked even if
    re-appended, until a compaction clears the tombstone set (re-ingest
    a removed asset under a fresh id, the same rule every
    tombstone-based store imposes).

    ``asset_ids`` is a one-column DataFrame or an iterable of ints.
    """
    if isinstance(asset_ids, DataFrame):
        ids = asset_ids.select(
            F.col(asset_ids.columns[0]).cast("long").alias("asset_id")
        )
    else:
        ids = local_df(
            spark, [(int(i),) for i in asset_ids], "asset_id long"
        )
    ids.write.mode("append").parquet(f"{path}/tombstones")


def compact_media_index(spark: SparkSession, path: str) -> None:
    """Physically drop tombstoned assets from the fingerprint and
    bucket stores, then clear the tombstone set. A no-op when nothing
    was removed. The rewrite is one filtered pass over each store —
    the reclaim cost every tombstone design amortizes by running
    compaction on a cadence, not per delete. localCheckpoint pins the
    filtered frames before their source paths are overwritten (lineage
    re-execution would otherwise read the half-rewritten store)."""
    ts = _tombstones(spark, path)
    if ts is None:
        return
    _mod, _mh, _bands, bucket_n = _read_meta(spark, path)
    ts_ids = ts.select("asset_id").distinct().localCheckpoint()
    fp = (
        spark.read.parquet(f"{path}/fingerprints")
        .join(ts_ids, "asset_id", "left_anti")
        .localCheckpoint()
    )
    name = _bucket_table_name(path)
    kept = (
        _register_bucketed(spark, path, bucket_n)
        .join(ts_ids, "asset_id", "left_anti")
        .localCheckpoint()
    )
    fp.hint("rebalance").write.mode("overwrite").parquet(
        f"{path}/fingerprints"
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    _delete_path(spark, f"{path}/buckets")
    _register_bucketed(spark, path, bucket_n)
    (
        kept.hint("rebalance", "band_idx", "band_val")
        .write.mode("append")
        .format("parquet")
        .bucketBy(bucket_n, "band_idx", "band_val")
        .sortBy("band_idx", "band_val")
        .saveAsTable(name)
    )
    _delete_path(spark, f"{path}/tombstones")
