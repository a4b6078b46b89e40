"""Streaming ANN intake (`streaming/ann_intake.py`): the IVF embedding
index becomes continuously-maintained dedup state, with the media
sink's guarantees — batch twin, ledger replay skip, crash-before-ledger
convergence, empty-batch no-op."""

from __future__ import annotations

import math
import shutil

import pytest
from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.streaming.ann_intake import (
    ann_intake_sink,
    read_ann_verdicts,
)

SCHEMA = "vec_id long, embedding array<double>"
D = 8


def _v(axis: int, mix: float = 0.0, other: int = 1) -> list[float]:
    x = [0.0] * D
    x[axis] = 1.0
    if mix:
        x[other] = mix
    n = math.sqrt(sum(a * a for a in x))
    return [a / n for a in x]


B1 = [(1, _v(0)), (2, _v(0)), (3, _v(1))]          # 2 = exact copy of 1
B2 = [(4, _v(0)),                                   # exact recrawl of 1
      (5, _v(2)),                                   # novel, orthogonal
      (6, _v(0, mix=0.3))]                          # near-dup of 1 (~0.958)


@pytest.fixture()
def paths(tmp_path):
    return (
        str(tmp_path / "ann_idx"),
        str(tmp_path / "ann_out"),
        tmp_path,
    )


def _run_stream(spark, tmp_path, idx, out):
    import os

    d = tmp_path / "ann_src"
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(B1, SCHEMA).coalesce(1).write.parquet(
        str(d / "b1.parquet")
    )
    spark.createDataFrame(B2, SCHEMA).coalesce(1).write.parquet(
        str(d / "b2.parquet")
    )
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*.parquet"))
    )
    q = (
        src.writeStream.foreachBatch(
            ann_intake_sink(idx, out, threshold=0.9, n_lists=2, nprobe=2)
        )
        .option("checkpointLocation", str(tmp_path / "ann_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_ann_intake_twin_and_replay(spark, paths):
    idx, out, tmp_path = paths
    _run_stream(spark, tmp_path, idx, out)

    v = {r["vec_id"]: r for r in read_ann_verdicts(spark, out).collect()}
    assert len(v) == 6
    assert {i for i, r in v.items() if r["kept"]} == {1, 3, 5}
    assert not v[2]["is_dup"] and not v[2]["kept"]  # intra-batch exact loser
    assert v[4]["is_dup"] and v[4]["best_match_id"] == 1
    assert v[4]["best_score"] == pytest.approx(1.0, abs=1e-6)
    assert v[6]["is_dup"] and v[6]["best_match_id"] == 1
    assert 0.9 <= v[6]["best_score"] <= 1.0
    assert not v[5]["is_dup"]

    stored = {
        r["vec_id"]
        for r in spark.read.parquet(f"{idx}/assignments").collect()
    }
    assert stored == {1, 3, 5}

    # committed replay: ledger skips, nothing changes
    sink = ann_intake_sink(idx, out, threshold=0.9, n_lists=2, nprobe=2)
    sink(spark.createDataFrame(B2, SCHEMA), 1)
    assert spark.read.parquet(f"{idx}/assignments").count() == 3
    assert read_ann_verdicts(spark, out).count() == 6

    # crash BEFORE the ledger write: full re-run of batch 1 — verdict
    # partition overwrites, anti-join appends nothing twice, vec 5
    # (now indexed; self-matches are filtered) stays kept
    shutil.rmtree(f"{idx}/_applied_batch")
    sink(spark.createDataFrame(B2, SCHEMA), 1)
    assert spark.read.parquet(f"{idx}/assignments").count() == 3
    v2 = {r["vec_id"]: r for r in read_ann_verdicts(spark, out).collect()}
    assert len(v2) == 6
    assert v2[4]["is_dup"] and v2[5]["kept"]

    # batch twin: manual build over b1 keepers + query of b2 agrees
    from quantlab_data_pipeline_spark.llm.ann_index import (
        build_ivf_index,
        query_ivf_index,
    )

    idx2 = str(tmp_path / "ann_idx_twin")
    build_ivf_index(
        spark.createDataFrame([B1[0], B1[2]], SCHEMA), idx2, n_lists=2
    )
    twin = {
        r["query_id"]: r
        for r in query_ivf_index(
            spark.createDataFrame(B2, SCHEMA), idx2, k=1, nprobe=2
        ).collect()
    }
    for vid in (4, 5, 6):
        twin_dup = (
            vid in twin and twin[vid]["score"] >= 0.9
        )
        assert twin_dup == v[vid]["is_dup"]
        if twin_dup:
            assert twin[vid]["neighbor_id"] == v[vid]["best_match_id"]


def test_ann_intake_empty_batch_noop(spark, paths):
    idx, out, _ = paths
    sink = ann_intake_sink(idx, out)
    sink(spark.createDataFrame([], SCHEMA), 0)
    from quantlab_data_pipeline_spark.fsutil import path_exists

    assert not path_exists(spark, f"{idx}/centroids")
    assert not path_exists(spark, f"{idx}/_applied_batch")
