"""Persistent incremental dedup index (llm/dedup_index.py).

The intake-loop contract: build once, flag each new batch with two
narrow joins against the stored state (no corpus re-read), append the
accepted docs. Exact re-ingests must always be caught (identical docs
collide in every band), unrelated docs must pass, and the band
structure recorded at build time must be enforced."""

from __future__ import annotations

import pytest

PROSE = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the quiet green forest before the sun finally sets "
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def index_path(tmp_path):
    return str(tmp_path / "dedup_index")


def _corpus(spark):
    rows = [
        (i, f"{PROSE} unique tail number {i} " + f"suffix {i} " * 5)
        for i in range(20)
    ]
    return _docs(spark, rows)


def test_exact_reingest_always_flagged(spark, index_path):
    from quantlab_data_pipeline_spark.llm.dedup_index import (
        build_dedup_index,
        flag_new_batch,
        query_dedup_index,
    )

    corpus = _corpus(spark)
    build_dedup_index(corpus, index_path, num_hashes=32, bands=8)

    # Batch: one exact copy of doc 3, one unrelated doc.
    batch = _docs(
        spark,
        [
            (103, f"{PROSE} unique tail number 3 " + "suffix 3 " * 5),
            (
                999,
                "completely different content about databases and "
                "distributed query engines with nothing shared at all "
                "here in this entirely unrelated document text body",
            ),
        ],
    )
    pairs = {
        (r["new_id"], r["indexed_id"]): r["est_jaccard"]
        for r in query_dedup_index(batch, index_path, threshold=0.9).collect()
    }
    assert pairs[(103, 3)] == 1.0  # identical signature, every band collides
    assert all(nid != 999 for nid, _ in pairs)

    flagged = {
        r["doc_id"]: r for r in flag_new_batch(batch, index_path, 0.9).collect()
    }
    assert flagged[103]["is_dup"] and flagged[103]["best_match_id"] == 3
    assert not flagged[999]["is_dup"] and flagged[999]["n_matches"] == 0


def test_append_grows_the_index(spark, index_path):
    from quantlab_data_pipeline_spark.llm.dedup_index import (
        append_to_index,
        build_dedup_index,
        query_dedup_index,
    )

    build_dedup_index(_corpus(spark), index_path, num_hashes=32, bands=8)
    fresh = _docs(
        spark,
        [(200, "a brand new accepted document about parquet bucketing "
               "strategies and shuffle-free joins at petabyte scale")],
    )
    # Not a dup yet -> accepted -> appended.
    assert not query_dedup_index(fresh, index_path, 0.9).collect()
    append_to_index(fresh, index_path)

    # A later re-ingest of the appended doc is now caught.
    again = _docs(
        spark,
        [(201, "a brand new accepted document about parquet bucketing "
               "strategies and shuffle-free joins at petabyte scale")],
    )
    hits = query_dedup_index(again, index_path, 0.9).collect()
    assert [(r["new_id"], r["indexed_id"]) for r in hits] == [(201, 200)]


def test_near_duplicate_estimate_orders_by_similarity(spark, index_path):
    from quantlab_data_pipeline_spark.llm.dedup_index import (
        build_dedup_index,
        query_dedup_index,
    )

    base = PROSE * 4
    build_dedup_index(
        _docs(spark, [(1, base)]), index_path, num_hashes=64, bands=16
    )
    light_edit = base + " one extra closing sentence appended here"
    batch = _docs(spark, [(10, base), (11, light_edit)])
    est = {
        r["new_id"]: r["est_jaccard"]
        for r in query_dedup_index(batch, index_path, threshold=0.3).collect()
    }
    assert est[10] == 1.0
    assert 0.3 <= est[11] < 1.0  # near-dup: high but below exact


def test_band_structure_enforced(spark, index_path):
    from quantlab_data_pipeline_spark.llm.dedup_index import (
        build_dedup_index,
        read_index_meta,
    )

    with pytest.raises(ValueError, match="must divide"):
        build_dedup_index(_corpus(spark), index_path, num_hashes=64, bands=7)
    build_dedup_index(_corpus(spark), index_path, num_hashes=64, bands=16)
    assert read_index_meta(spark, index_path) == (64, 16, 3)


def test_index_stores_no_text(spark, index_path):
    """The index must be text-free (ids + hashes only) — that is the
    scale contract that keeps it a few percent of corpus size."""
    from quantlab_data_pipeline_spark.llm.dedup_index import build_dedup_index

    build_dedup_index(_corpus(spark), index_path, num_hashes=32, bands=8)
    sig_cols = spark.read.parquet(f"{index_path}/signatures").columns
    bucket_cols = spark.read.parquet(f"{index_path}/buckets").columns
    assert "text" not in sig_cols and "shingles" not in sig_cols
    assert set(bucket_cols) == {"doc_id", "band_idx", "band_hash"}
