"""Structured Streaming tests: the streaming plans must produce the
same answers as their batch twins on the finite events file."""

from __future__ import annotations

from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.sources.testdata import load_table
from quantlab_data_pipeline_spark.streaming.events import (
    run_to_memory,
    sessionize,
    stream_events,
    windowed_aggregate,
)

SF = "/root/testdata/sf0.001"


def test_windowed_aggregate_matches_batch(spark):
    stream = stream_events(spark, SF)
    got = run_to_memory(windowed_aggregate(stream), "win_agg").toPandas()

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
        .toPandas()
    )
    key = ["window_start", "event_type"]
    g = got[key + ["n", "total_value"]].sort_values(key).reset_index(drop=True)
    b = batch[key + ["n", "total_value"]].sort_values(key).reset_index(drop=True)
    assert len(g) == len(b) > 0
    assert (g["n"].to_numpy() == b["n"].to_numpy()).all()
    assert (g["total_value"].to_numpy() == b["total_value"].to_numpy()).all()


def test_sessionize_runs(spark):
    stream = stream_events(spark, SF)
    out = run_to_memory(sessionize(stream, gap="10 minutes"), "sessions").toPandas()
    assert len(out) > 0
    assert (out["session_end"] > out["session_start"]).all()
    assert (out["n_events"] >= 1).all()
