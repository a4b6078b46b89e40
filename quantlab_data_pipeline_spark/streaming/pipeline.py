"""End-to-end streaming curation: the ``curate_corpus_r8`` composition,
streamed (VERDICT r8 item 7).

One pipeline wires the whole intake chain over a page stream:

    blocklist -> extract -> quality -> URL dedup   (upstream stages)
        -> perceptual media dedup -> DSIR scoring  (foreachBatch sink)

The upstream stages are :func:`..streaming.intake.streaming_crawl_intake`
verbatim — three stateless codegen projections plus the one
engine-stateful URL ``dropDuplicates`` — so they inherit its batch-twin
evidence. The two stages that need CROSS-BATCH stores (the persisted
perceptual index and the DSIR raw-count model) run inside ONE
``foreachBatch`` sink that composes the existing replay-idempotent
intake sinks (:func:`..streaming.media_intake.media_intake_sink`,
:func:`..streaming.dsir_intake.dsir_intake_sink`) under the SAME
batch_id. Composing the sinks rather than re-implementing them means
every crash/replay guarantee is inherited stage by stage:

* a replayed batch id is skipped by each store's ledger;
* a crash BETWEEN the media stage and the DSIR stage replays into a
  media ledger-skip (its verdicts are already persisted, and the kept
  set is re-read from them — identical input to the DSIR stage) and a
  normal DSIR run;
* a crash before either ledger write re-runs that stage onto
  partition-overwritten verdicts and anti-joined appends — convergent,
  as pinned by the per-sink replay tests.

Scale shape: everything upstream is per-row projection work; the sink
stages shuffle only 8-byte fingerprints / bucket counts per batch
(media index O(batch + candidates), DSIR fold O(distinct buckets)).
Nothing corpus-sized moves per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir_intake import dsir_intake_sink
from .intake import streaming_crawl_intake
from .media_intake import media_intake_sink, read_intake_verdicts

__all__ = ["curation_intake_sink", "streaming_curation_pipeline"]


def curation_intake_sink(
    media_index_path: str,
    media_out: str,
    dsir_target_path: str,
    dsir_raw_path: str,
    dsir_out: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: tuple[int, int] = (32, 32),
    max_hamming: int = 0,
    bands: int | None = 4,
    frac: float | None = None,
    k: int | None = None,
    salt: str = "dsir",
):
    """``foreachBatch`` function chaining media dedup then DSIR scoring.

    Per micro-batch: docs render to fixed-frame PNGs and run the media
    intake loop (cross-batch perceptual dedup against the persisted
    index at ``media_index_path``, intra-batch exact dedup, verdicts to
    ``media_out``); the media KEEPERS then run the DSIR intake loop
    (fold into the raw model at ``dsir_raw_path``, score against the
    offline-built target at ``dsir_target_path``, verdicts to
    ``dsir_out``). Both sub-sinks keep their own ledgers keyed by the
    same outer batch_id, so partial-failure replays converge per stage.
    """
    from ..llm.multimodal import media_from_text

    media_apply = media_intake_sink(
        media_index_path,
        media_out,
        modality="image",
        max_hamming=max_hamming,
        bands=bands,
    )
    dsir_apply = dsir_intake_sink(
        dsir_target_path, dsir_raw_path, dsir_out, frac=frac, k=k, salt=salt
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Materialize the batch ONCE (guide §1.2): the two sub-sinks
        # run ~8 actions per micro-batch between them (existence
        # probes, fingerprint pass, verdict write, index append, DSIR
        # fold + score), and each action would otherwise re-evaluate
        # the ENTIRE upstream plan feeding this sink — for the batch
        # registry row that is the blocklist→extract→quality→URL-dedup
        # chain over the full corpus, re-run per action. A real
        # foreachBatch source hands the sink materialized batch data;
        # localCheckpoint restores exactly that property in the batch-
        # twin path, and block loss mid-batch just replays the batch
        # (both sub-sinks are replay-convergent by construction).
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).localCheckpoint()
        if docs.isEmpty():
            return
        kept_ids = media_apply(media_from_text(docs, dims=dims), batch_id)
        if kept_ids is not None:
            # Normal path: the media sink hands back its kept set,
            # derived from the localCheckpointed verdict frame it just
            # persisted — byte-equal to re-reading the verdict log,
            # without the per-batch listing+scan of ``media_out``
            # (guide §1.2).
            kept = kept_ids.select(F.col("asset_id").alias("doc_id"))
        else:
            # Replay where the media ledger skips (verdicts already
            # persisted by a previous attempt): read the keeper set
            # back from the PERSISTED verdicts — identical input to
            # the DSIR stage as the original attempt saw.
            kept = (
                read_intake_verdicts(spark, media_out)
                .filter(F.col("batch_id") == int(batch_id))
                .filter("kept")
                .select(F.col("asset_id").alias("doc_id"))
            )
        dsir_apply(docs.join(kept, "doc_id"), batch_id)

    return _apply


def streaming_curation_pipeline(
    pages: DataFrame,
    media_index_path: str,
    media_out: str,
    dsir_target_path: str,
    dsir_raw_path: str,
    dsir_out: str,
    *,
    blocklist=None,
    watermark: str | None = None,
    min_chars: int = 1,
    id_col: str = "doc_id",
    dims: tuple[int, int] = (32, 32),
    max_hamming: int = 0,
    bands: int | None = 4,
    frac: float | None = None,
    k: int | None = None,
    salt: str = "dsir",
):
    """The full curation chain as one ready-to-start stream.

    Returns a ``DataStreamWriter`` — attach a checkpoint and call
    ``.start()``::

        q = (streaming_curation_pipeline(pages, *stores, blocklist=bl, k=1)
             .option("checkpointLocation", ckpt)
             .start())
    """
    kept = streaming_crawl_intake(
        pages, blocklist=blocklist, watermark=watermark, min_chars=min_chars
    )
    return kept.writeStream.foreachBatch(
        curation_intake_sink(
            media_index_path,
            media_out,
            dsir_target_path,
            dsir_raw_path,
            dsir_out,
            id_col=id_col,
            dims=dims,
            max_hamming=max_hamming,
            bands=bands,
            frac=frac,
            k=k,
            salt=salt,
        )
    )
