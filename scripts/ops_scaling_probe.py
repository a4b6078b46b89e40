"""Scale-up probe for the round-2 operator families: as-of (forward),
gaps-and-islands (interval merge, SCD2), and BM25 retrieval.

Replicates the sf0.1 events/documents Nx into /tmp (key-offset per
copy: user_id/doc_id shift so per-key group sizes stay realistic) and
times each operator at each multiple. Near-linear growth = no
super-linear stage; these four are all single-keyed-shuffle plans, so
their lines should track data volume.

Usage: python scripts/ops_scaling_probe.py [multiples ...] (default 1 4 16)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.operators.asof import as_of_join  # noqa: E402
from quantlab_data_pipeline_spark.operators.scd2 import (  # noqa: E402
    merge_intervals,
    scd2_from_changelog,
)
from quantlab_data_pipeline_spark.llm.search import bm25_search  # noqa: E402
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402
from quantlab_data_pipeline_spark.sources.testdata import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
WORK = Path("/tmp/ops_scaling_probe")


def replicate(spark, table: str, mult: int, key_col: str) -> str:
    out = WORK / f"{table}_x{mult}.parquet"
    if out.exists():
        return str(out)
    base = load_table(spark, SRC, table)
    copies = [
        base.withColumn(key_col, F.col(key_col) + F.lit(i * 10_000_000))
        for i in range(mult)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.write.mode("overwrite").parquet(str(out))
    return str(out)


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark()
    spark.range(1).count()
    for m in mults:
        ev = spark.read.parquet(replicate(spark, "events", m, "user_id"))
        docs = spark.read.parquet(replicate(spark, "documents", m, "doc_id"))
        ev.count(), docs.count()  # warm page cache

        views = ev.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts"
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value"
        )
        t_asof = timed(
            lambda: as_of_join(
                views, clicks, on=["user_id"], direction="forward",
                tolerance_seconds=3600.0, prefix="next_",
            ).count()
        )
        iv = ev.select(
            "user_id",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
        )
        t_merge = timed(
            lambda: merge_intervals(iv, ["user_id"], "s", "e").count()
        )
        t_scd2 = timed(
            lambda: scd2_from_changelog(
                ev.select("user_id", "ts", "event_type"),
                ["user_id"], "ts", ["event_type"], ["event_type"],
            ).count()
        )
        t_bm25 = timed(
            lambda: bm25_search(docs, ["spark", "window", "merge"]).count()
        )
        print(
            json.dumps(
                {
                    "mult": m,
                    "events_rows": ev.count(),
                    "docs_rows": docs.count(),
                    "asof_forward_s": t_asof,
                    "merge_intervals_s": t_merge,
                    "scd2_s": t_scd2,
                    "bm25_s": t_bm25,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
