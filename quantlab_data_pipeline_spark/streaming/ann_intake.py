"""Streaming embedding-ANN intake (foreachBatch sink).

Completes the intake triad: the MinHash text index
(:mod:`.dedup` / :mod:`..llm.dedup_index`), the perceptual media index
(:mod:`.media_intake`), and now the IVF embedding index — all three
persisted dedup stores are continuously maintainable from a stream
with the same guarantees. An embedding stream (fresh crawl vectors)
flags each micro-batch against the persisted IVF index (semantic
near-dup = top-1 cosine >= threshold), writes verdicts durably, and
appends only the accepted novel vectors under the FROZEN centroids
(the FAISS add-after-train convention — query semantics stay identical
to a from-scratch build with the same quantizers).

Order of operations per batch is the media sink's, and load-bearing
for the same reasons (verdicts to stable storage BEFORE the index
mutates — appending re-caches dependent plans against the new file
list; ledger fast-path; anti-join append so crash-replays converge):

1. flag the batch against the index (partition-pruned nprobe scan);
2. write verdicts hive-partitioned by batch_id with dynamic partition
   overwrite (a replay rewrites, never duplicates);
3. append accepted vectors, anti-joined on already-stored ids;
4. record the batch id in the ledger.

Intra-batch policy matches media intake: two same-batch vectors within
the threshold are both admitted (the index arbitrates across batches);
intra-batch EXACT duplicates (bit-identical embeddings) keep the min
id. The first non-empty batch builds the index and trains centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import path_exists
from ..localframe import local_df
from ..llm.ann_index import (
    append_to_ann_index,
    build_ivf_index,
    query_ivf_index,
)
from .rollup_sink import last_applied_batch

__all__ = ["ann_intake_sink", "read_ann_verdicts"]


def _index_exists(spark: SparkSession, index_path: str) -> bool:
    return path_exists(spark, f"{index_path}/centroids")


def ann_intake_sink(
    index_path: str,
    out_path: str,
    threshold: float = 0.9,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """A ``foreachBatch`` function running the ANN-dedup intake loop.

    Usage::

        q = (vector_stream.writeStream
             .foreachBatch(ann_intake_sink(idx, out))
             .option("checkpointLocation", ckpt)
             .start())

    ``out_path`` receives one verdict row per batch vector, hive-
    partitioned by ``batch_id``: (vec_id, is_dup, best_match_id,
    best_score, kept) — ``is_dup`` is the cross-batch index verdict at
    ``threshold``, ``kept`` additionally requires winning the
    intra-batch exact (bit-identical embedding) dedup; only kept
    vectors enter the index.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id <= last_applied_batch(spark, index_path):
            return  # replayed after commit: already folded in, skip
        if batch_df.isEmpty():
            return
        first = not _index_exists(spark, index_path)
        if first:
            flagged = batch_df.select(
                F.col(id_col),
                F.lit(False).alias("is_dup"),
                F.lit(None).cast("long").alias("best_match_id"),
                F.lit(None).cast("double").alias("best_score"),
            )
        else:
            best = query_ivf_index(
                batch_df,
                index_path,
                k=1,
                nprobe=nprobe,
                id_col=id_col,
                vec_col=vec_col,
            ).select(
                F.col("query_id").alias(id_col),
                F.col("neighbor_id").alias("best_match_id"),
                F.col("score").alias("best_score"),
            )
            flagged = (
                batch_df.select(id_col)
                .join(best, id_col, "left")
                .select(
                    F.col(id_col),
                    F.coalesce(
                        F.col("best_score") >= threshold, F.lit(False)
                    ).alias("is_dup"),
                    "best_match_id",
                    "best_score",
                )
            )
        # intra-batch exact dedup: min id per bit-identical embedding
        winners = (
            batch_df.join(
                flagged.filter(~F.col("is_dup")).select(id_col), id_col
            )
            .select(id_col, F.md5(F.col(vec_col).cast("string")).alias("__fp"))
            .groupBy("__fp")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col, F.lit(True).alias("kept"))
        )
        verdicts = flagged.join(winners, id_col, "left").withColumn(
            "kept", F.coalesce("kept", F.lit(False))
        )
        # Step 2: verdicts to stable storage BEFORE the index mutates.
        (
            verdicts.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )
        kept_ids = (
            spark.read.parquet(out_path)
            .filter(F.col("batch_id") == int(batch_id))
            .filter("kept")
            .select(id_col)
        )
        accepted = batch_df.join(kept_ids, id_col)
        if first:
            build_ivf_index(
                accepted,
                index_path,
                n_lists=n_lists,
                id_col=id_col,
                vec_col=vec_col,
            )
        else:
            novel = accepted.join(
                spark.read.parquet(f"{index_path}/assignments").select(
                    id_col
                ),
                id_col,
                "left_anti",
            )
            if not novel.isEmpty():
                append_to_ann_index(
                    novel, index_path, id_col=id_col, vec_col=vec_col
                )
        local_df(
            spark, [(int(batch_id),)], "batch_id long"
        ).coalesce(1).write.mode("append").parquet(
            f"{index_path}/_applied_batch"
        )

    return _apply


def read_ann_verdicts(spark: SparkSession, out_path: str) -> DataFrame:
    """The accumulated verdict log written by :func:`ann_intake_sink`."""
    return spark.read.parquet(out_path)
