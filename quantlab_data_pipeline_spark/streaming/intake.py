"""Streaming crawl intake: the round-6/7 batch intake family as a
Structured Streaming pipeline.

A crawl never stops, so the front of the training-data pipeline is a
stream: pages arrive, main content is extracted, the frozen quality
gate drops junk, and the first page per normalized URL wins. Three of
those four stages (extraction, quality, URL normalization) are pure
codegen projections — stream-safe by construction, identical plans to
the batch rows ``html_extract_docs`` / ``ml_quality_frozen_docs`` /
``url_dedup_docs``. The only stateful stage is the URL dedup:

* with ``watermark`` (the production setting) —
  ``dropDuplicatesWithinWatermark`` keyed on the normalized URL, so the
  state store holds only the watermark window (recrawls of the same
  URL cluster in time; a crawl that re-fetches a URL months later is a
  new snapshot anyway, which is usually what you want kept);
* without (None) — exact ``dropDuplicates``: unbounded state, only for
  bounded backfills and tests.

First-arrival-wins, matching the streaming exact-dedup contract (the
batch twin's min-id keeper equals it when arrival order follows ids —
asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_crawl_intake(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    watermark: str | None = "1 hour",
    min_chars: int = 1,
) -> DataFrame:
    """pages(url, html[, fetch_ts]) -> kept docs with extracted text.

    Output columns: every input column except ``html``, plus ``text``
    (extracted main content), ``ml_logit``/``ml_keep`` (frozen quality)
    and ``norm_url``. Rows dropped: failed extraction (< ``min_chars``
    chars), quality rejects, and all but the first arrival per
    normalized URL.
    """
    from ..llm.classifier import score_quality_frozen
    from ..llm.extract import html_to_text
    from ..llm.frozen_quality import (
        FROZEN_QUALITY_V1_BIAS,
        FROZEN_QUALITY_V1_WEIGHTS,
    )
    from ..llm.urls import normalize_url

    extracted = html_to_text(pages, html_col, "text").drop(html_col)
    scored = score_quality_frozen(
        extracted,
        FROZEN_QUALITY_V1_BIAS,
        FROZEN_QUALITY_V1_WEIGHTS,
        text_col="text",
    )
    kept = scored.filter(
        F.col("ml_keep") & (F.length("text") >= min_chars)
    ).withColumn("norm_url", normalize_url(url_col))
    if watermark is None:
        return kept.dropDuplicates(["norm_url"])
    return kept.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["norm_url"]
    )
