"""Streaming DSIR intake (foreachBatch sink).

Completes the DSIR story the way :mod:`.media_intake` completes the
media-index one: :mod:`..llm.dsir` gives the persisted count model
(target built offline from the curated corpus; raw folded forward
batch by batch); this wires a crawl STREAM into it, so every
micro-batch is importance-scored at decision time and the raw model
follows the crawl without ever re-tokenizing accepted batches.

Per micro-batch, in this order:

1. FOLD the batch's bucket-count delta into the raw store, written to
   ``{raw_path}/counts/batch_id=N`` with dynamic partition overwrite —
   a crash-replay rewrites its own partition, so folding is exactly
   idempotent even though counts (unlike fingerprints) cannot be
   anti-joined. The first non-empty batch also writes the store meta,
   COPIED from the target store so the two feature spaces can never
   diverge.
2. score the batch with :func:`..llm.dsir.dsir_select_stored` against
   the target store and the just-folded raw store — each batch scores
   under the raw model including everything seen up to and including
   itself (the uniform rule that makes batch 0, whose only model is
   itself, consistent with every later batch), with selection ranks
   and the frac/k cut applied WITHIN the batch;
3. verdicts land at ``out_path`` hive-partitioned by ``batch_id``
   (dynamic overwrite: replays rewrite, never duplicate);
4. the ledger records the batch id (fast-path skip on the ordinary
   replay-after-commit).

Re-running any prefix of the four steps converges: 1 and 3 are
partition overwrites keyed on the batch id, 2 is a pure function of
stores that step 1 makes deterministic, 4 is the commit mark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.dsir import dsir_select_stored, hashed_ngram_counts, read_dsir_meta
from ..fsutil import path_exists
from ..localframe import local_df
from .rollup_sink import last_applied_batch

__all__ = ["dsir_intake_sink", "read_dsir_verdicts"]


def _store_exists(spark: SparkSession, path: str) -> bool:
    # Hadoop-FS probe, NOT os.path: a local-FS check on a cluster store
    # URI would route every restart into the "first batch" build path.
    return path_exists(spark, f"{path}/meta")


def dsir_intake_sink(
    target_path: str,
    raw_path: str,
    out_path: str,
    frac: float | None = None,
    k: int | None = None,
    salt: str = "dsir",
):
    """A ``foreachBatch`` function running the DSIR intake loop.

    Usage::

        q = (doc_stream.writeStream
             .foreachBatch(dsir_intake_sink(target, raw, out, frac=0.25))
             .option("checkpointLocation", ckpt)
             .start())

    ``out_path`` receives one verdict row per batch doc, partitioned
    by ``batch_id``: (doc_id, n_grams, log_w, sel_key, rank, selected)
    — the :func:`..llm.dsir.dsir_select` contract, cut within the
    batch. The target store must exist (built offline with
    ``build_dsir_counts``); the raw store is created and owned by this
    sink, its feature space copied from the target's.
    """
    if (frac is None) == (k is None):
        raise ValueError("pass exactly one of frac= or k=")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id <= last_applied_batch(spark, raw_path):
            return  # replayed after commit: already folded in, skip
        if batch_df.isEmpty():
            return
        buckets, ns = read_dsir_meta(spark, target_path)
        if not _store_exists(spark, raw_path):
            local_df(
                spark,
                [(int(buckets), ",".join(str(n) for n in ns))],
                "buckets int, ns string",
            ).coalesce(1).write.mode("overwrite").parquet(f"{raw_path}/meta")
        # ONE tokenize pass per batch (guide §1.2): the md5-per-gram
        # explode is the dominant per-batch cost, and both the fold
        # (step 1) and the scoring join (step 2) consume exactly the
        # per-doc bucket counts. localCheckpoint materializes them
        # once — counts rows are (id, bucket, cnt), far smaller than
        # the text — and cuts lineage, so the scoring subtree cannot
        # re-evaluate against the just-appended raw store either.
        # Losing the blocks mid-batch replays the batch (idempotent by
        # the partition-overwrite design), so durability is unchanged.
        counts = hashed_ngram_counts(
            batch_df, buckets=buckets, ns=ns
        ).localCheckpoint()
        # Step 1: fold — partition overwrite keyed on batch_id makes a
        # crash-replay rewrite its own delta, never double-count it.
        (
            counts.groupBy("bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{raw_path}/counts")
        )
        # Step 2+3: score under the just-folded model, verdicts out.
        (
            dsir_select_stored(
                batch_df,
                target_path,
                raw_path,
                frac=frac,
                k=k,
                salt=salt,
                batch_counts=counts,
                # this sink read the target meta above and created the
                # raw store's meta as a copy of it — the scorer's two
                # meta reads + equality check are redundant per batch
                known_meta=(buckets, ns),
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )
        local_df(
            spark, [(int(batch_id),)], "batch_id long"
        ).coalesce(1).write.mode("append").parquet(f"{raw_path}/_applied_batch")

    return _apply


def read_dsir_verdicts(spark: SparkSession, out_path: str) -> DataFrame:
    """The accumulated verdict log written by :func:`dsir_intake_sink`."""
    return spark.read.parquet(out_path)
