"""Incremental materialized rollup (storage/rollup.py)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F


def _events(spark, days):
    rows = []
    i = 0
    for d, types in days:
        for typ, v in types:
            i += 1
            rows.append((i, dt.datetime(2024, 3, d, 10, i % 50), 1, typ, v, None))
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_refresh_equals_full_recompute(spark, tmp_path):
    from quantlab_data_pipeline_spark.storage.rollup import (
        build_rollup,
        read_rollup,
        refresh_rollup,
    )

    first = _events(
        spark, [(1, [("a", 1.0), ("a", 3.0), ("b", 5.0)]), (2, [("a", 7.0)])]
    )
    late = _events(spark, [(2, [("a", 9.0), ("b", 2.0)]), (3, [("b", 4.0)])])
    path = str(tmp_path / "rollup")
    build_rollup(first, path, "ts", ["event_type"], "value")
    keys = refresh_rollup(late, path, "ts", ["event_type"], "value")
    assert keys == ["2024-03-02", "2024-03-03"]  # only touched days

    got = {
        (r["grain_key"], r["event_type"]): (
            r["n"], r["sum_v"], r["min_v"], r["max_v"], r["avg_v"]
        )
        for r in read_rollup(spark, path).collect()
    }
    full = first.unionByName(late)
    exp = {
        (r["k"], r["event_type"]): (r["n"], r["s"], r["mn"], r["mx"], r["s"] / r["n"])
        for r in full.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("k"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == exp


def test_refresh_leaves_history_partitions_untouched(spark, tmp_path):
    """Dynamic partition overwrite must rewrite ONLY the refreshed
    grain partitions — day-1 files keep their mtimes."""
    import time

    from quantlab_data_pipeline_spark.storage.rollup import (
        build_rollup,
        refresh_rollup,
    )

    first = _events(spark, [(1, [("a", 1.0)]), (2, [("a", 2.0)])])
    late = _events(spark, [(2, [("a", 3.0)])])
    path = str(tmp_path / "rollup")
    build_rollup(first, path, "ts", ["event_type"], "value")

    day1 = os.path.join(path, "grain_key=2024-03-01")
    before = {
        f: os.path.getmtime(os.path.join(day1, f)) for f in os.listdir(day1)
    }
    time.sleep(1.1)
    refresh_rollup(late, path, "ts", ["event_type"], "value")
    after = {
        f: os.path.getmtime(os.path.join(day1, f)) for f in os.listdir(day1)
    }
    assert after == before  # same files, same mtimes


def test_bad_grain_raises(spark, tmp_path):
    import pytest

    from quantlab_data_pipeline_spark.storage.rollup import build_rollup

    df = _events(spark, [(1, [("a", 1.0)])])
    with pytest.raises(ValueError, match="grain"):
        build_rollup(df, str(tmp_path / "r"), "ts", [], "value", grain="week")


def test_time_ranged_read_prunes_partitions(spark, tmp_path):
    from quantlab_data_pipeline_spark.storage.rollup import (
        build_rollup,
        read_rollup,
    )

    df = _events(
        spark, [(d, [("a", float(d))]) for d in (1, 2, 3, 4, 5)]
    )
    path = str(tmp_path / "rollup")
    build_rollup(df, path, "ts", ["event_type"], "value")
    ranged = read_rollup(spark, path, since="2024-03-02", until="2024-03-04")
    assert sorted(r["grain_key"] for r in ranged.collect()) == [
        "2024-03-02",
        "2024-03-03",
    ]
    plan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(grain_key" in plan  # filter reached the scan


def test_streaming_rollup_sink_matches_batch(spark, tmp_path):
    """Stream -> foreachBatch rollup maintenance equals a one-shot
    aggregation, and a replayed micro-batch id is skipped (no double
    counting)."""
    from pyspark.sql import types as T

    from quantlab_data_pipeline_spark.storage.rollup import read_rollup
    from quantlab_data_pipeline_spark.streaming.rollup_sink import (
        last_applied_batch,
        rollup_sink,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    b1 = _events(spark, [(1, [("a", 1.0), ("b", 5.0)]), (2, [("a", 7.0)])])
    b2 = _events(spark, [(2, [("a", 9.0)]), (3, [("b", 4.0)])])
    src = tmp_path / "roll_src"
    src.mkdir()
    b1.coalesce(1).write.parquet(str(src / "b1.parquet"))
    b2.coalesce(1).write.parquet(str(src / "b2.parquet"))

    path = str(tmp_path / "live_rollup")
    sink = rollup_sink(path, "ts", ["event_type"], "value")
    stream = (
        spark.readStream.schema(T.StructType.fromDDL(schema))
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "roll_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["grain_key"], r["event_type"]): (r["n"], r["sum_v"])
        for r in read_rollup(spark, path).collect()
    }
    full = b1.unionByName(b2)
    from pyspark.sql import functions as FF

    exp = {
        (r["k"], r["event_type"]): (r["n"], r["s"])
        for r in full.groupBy(
            FF.date_format(FF.date_trunc("day", "ts"), "yyyy-MM-dd").alias("k"),
            "event_type",
        )
        .agg(FF.count("*").alias("n"), FF.sum("value").alias("s"))
        .collect()
    }
    assert got == exp

    # Replay: re-applying an already-folded batch id must be a no-op.
    applied = last_applied_batch(spark, path)
    assert applied >= 1
    sink(b2, applied)  # same id -> skipped
    again = {
        (r["grain_key"], r["event_type"]): (r["n"], r["sum_v"])
        for r in read_rollup(spark, path).collect()
    }
    assert again == got


def test_distinct_rollup_union_matches_exact(spark, tmp_path):
    """Per-day HLL sketches unioned across the month must estimate the
    month's exact distinct count (exact at these cardinalities — the
    sketch stays in sparse mode), and a range read must only union the
    requested days."""
    import datetime as dt

    from pyspark.sql import functions as F

    from quantlab_data_pipeline_spark.storage.rollup import (
        build_distinct_rollup,
        estimate_distinct,
    )

    rows = []
    for day in range(1, 11):
        for u in range(day * 7):          # growing overlapping user sets
            rows.append(
                (dt.datetime(2024, 7, day, 12), "a" if u % 2 else "b", u)
            )
    df = spark.createDataFrame(rows, "ts timestamp, seg string, user_id long")
    path = str(tmp_path / "dsk")
    build_distinct_rollup(df, path, "ts", ["seg"], "user_id")

    got = {
        r["seg"]: r["n_distinct"]
        for r in estimate_distinct(spark, path, ["seg"]).collect()
    }
    exact = {
        r["seg"]: r["n"]
        for r in df.groupBy("seg")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact  # sparse-mode HLL is exact at this cardinality

    # pruned range: first 3 days only
    got3 = {
        r["seg"]: r["n_distinct"]
        for r in estimate_distinct(
            spark, path, ["seg"], "2024-07-01", "2024-07-03"
        ).collect()
    }
    exact3 = {
        r["seg"]: r["n"]
        for r in df.filter(F.dayofmonth("ts") <= 3)
        .groupBy("seg")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got3 == exact3


def test_quantile_rollup_rank_error_bound(spark, tmp_path):
    """Compacting case (k small, n >> k): the merged-sketch quantile
    must sit within the published KLL rank-error band (~1.7% of rank
    at k=200; assert a conservative 5%) of the exact order statistic,
    and a grain-key range read must answer a sub-window without
    touching the fact."""
    import datetime as dt

    import numpy as np

    from quantlab_data_pipeline_spark.storage.rollup import (
        build_quantile_rollup,
        estimate_quantiles,
    )

    rng = np.random.default_rng(7)
    n = 20_000
    rows = [
        (
            dt.datetime(2024, 1, 1 + int(i % 28)),
            "a" if i % 2 == 0 else "b",
            float(v),
        )
        for i, v in enumerate(rng.lognormal(0.0, 1.0, n))
    ]
    df = spark.createDataFrame(rows, "ts timestamp, seg string, v double")
    path = str(tmp_path / "kllq")
    build_quantile_rollup(df, path, "ts", ["seg"], "v", k=200)

    got = {
        r["seg"]: (r["q_0_5"], r["q_0_99"])
        for r in estimate_quantiles(spark, path, ["seg"], [0.5, 0.99]).collect()
    }
    pdf = df.toPandas()
    for seg, (g50, g99) in got.items():
        vals = np.sort(pdf[pdf.seg == seg].v.to_numpy())
        for q, got_v in ((0.5, g50), (0.99, g99)):
            # rank of the returned value must be within 5% of q*n
            rank = np.searchsorted(vals, got_v, side="right") / len(vals)
            assert abs(rank - q) <= 0.05, (seg, q, rank)
    # ranged read: only the first week's partitions
    wk = estimate_quantiles(
        spark, path, ["seg"], [0.5],
        start_key="2024-01-01", end_key="2024-01-07",
    ).collect()
    sub = pdf[pdf.ts <= dt.datetime(2024, 1, 7)]
    for r in wk:
        vals = np.sort(sub[sub.seg == r["seg"]].v.to_numpy())
        rank = np.searchsorted(vals, r["q_0_5"], side="right") / len(vals)
        assert abs(rank - 0.5) <= 0.05
