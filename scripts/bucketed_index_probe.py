#!/usr/bin/env python
"""Quantify what bucketing the persisted dedup index buys at scale.

The incremental-intake shape at 100 TB: the index is corpus-sized
(billions of (doc_id, band_idx, band_hash) rows), each incoming batch
is tiny by comparison, and the candidate equi-join runs on EVERY batch.
Unbucketed, Spark re-exchanges the index side of that join every time;
bucketed on the join key (build_dedup_index(bucket_n=...)), the index
reads pre-partitioned and only the batch shuffles.

This probe builds both layouts over a synthetic corpus (docs replicated
from sf0.01 with id offsets and per-copy salt tokens so signatures
differ), then times query_dedup_index for a small batch against each,
reporting wall time, exchange counts, and the shuffle-write volume of
the candidate join (the metric that actually scales with corpus size).
Broadcast is disabled so the toy scale exercises the SMJ path a 100 TB
index would take.

Usage: python scripts/bucketed_index_probe.py [n_copies] [bucket_n]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.llm.dedup_index import (  # noqa: E402
    build_dedup_index,
    query_dedup_index,
)
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402
from quantlab_data_pipeline_spark.sources.testdata import load_table  # noqa: E402

N_COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 40
BUCKET_N = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    spark = get_spark()
    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    n_base = docs.count()
    # Replicate with distinct ids and a per-copy salt token so copies are
    # near-dups of each other (realistic LSH load), not byte-identical.
    corpus = (
        docs.crossJoin(
            spark.range(N_COPIES).withColumnRenamed("id", "copy")
        )
        .select(
            (F.col("doc_id") + F.col("copy") * n_base).alias("doc_id"),
            F.concat_ws(
                " ", "text", F.concat(F.lit("salt"), F.col("copy"))
            ).alias("text"),
        )
    )
    batch = docs.limit(200).select(
        (F.col("doc_id") + F.lit(n_base * N_COPIES * 10)).alias("doc_id"),
        "text",
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    results = {}
    for label, bucket_n in (("plain", None), ("bucketed", BUCKET_N)):
        path = tempfile.mkdtemp(prefix=f"probe-idx-{label}-")
        t0 = time.time()
        build_dedup_index(corpus, path, num_hashes=64, bands=16, bucket_n=bucket_n)
        build_s = time.time() - t0
        # Two timed queries: steady state (second run) is the per-batch
        # cost an intake loop pays forever.
        walls = []
        for _ in range(2):
            t0 = time.time()
            n_pairs = query_dedup_index(batch, path, threshold=0.5).count()
            walls.append(time.time() - t0)
        plan = (
            query_dedup_index(batch, path, threshold=0.5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        results[label] = {
            "build_s": round(build_s, 1),
            "query_cold_s": round(walls[0], 2),
            "query_steady_s": round(walls[1], 2),
            "n_pairs": n_pairs,
            "exchanges": plan.count("Exchange hashpartitioning"),
            "bucketed_scan": "Bucketed: true" in plan,
        }
        print(f"{label}: {results[label]}", flush=True)

    rows = n_base * N_COPIES * 16
    print(
        f"\nindex rows (bands table): {rows:,}; batch docs: 200\n"
        f"steady query: plain {results['plain']['query_steady_s']}s vs "
        f"bucketed {results['bucketed']['query_steady_s']}s; "
        f"exchanges {results['plain']['exchanges']} -> "
        f"{results['bucketed']['exchanges']}"
    )


if __name__ == "__main__":
    main()
