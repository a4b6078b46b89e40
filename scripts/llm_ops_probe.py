"""Micro-bench of the training-data layout/filter ops (the numbers in
BASELINE.md §"Training-data op micro-bench").

Runs each op end-to-end at $SPARK_GRAFT_SF_DIR (default sf0.1) and
prints one line per op plus a JSON summary. The documents table is
repartitioned to the session parallelism first — the sf0.1 file is a
single parquet split, which would serialize per-row-heavy ops behind
one core and measure partitioning, not the operator.

Usage: python scripts/llm_ops_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from quantlab_data_pipeline_spark.llm import (  # noqa: E402
    build_ivf_pq_index,
    chunk_plan,
    dedup_lines,
    mix_corpus,
    pack_documents,
    query_ivf_pq_index,
    semantic_dedup,
    shuffle_rows,
    with_gopher_keep,
)
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402
from quantlab_data_pipeline_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="llm-ops-probe")
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, SF_DIR, "documents").repartition(par).cache()
    emb = load_table(spark, SF_DIR, "embeddings")
    n_docs, n_emb = docs.count(), emb.count()

    ops = {
        "gopher_filter": lambda: with_gopher_keep(docs).filter("gopher_keep").count(),
        "dedup_lines": lambda: dedup_lines(docs)
        .agg({"n_lines_dropped": "sum"})
        .collect()[0][0],
        "pack_documents_2048": lambda: pack_documents(docs, 2048)
        .select("pack_id")
        .distinct()
        .count(),
        "chunk_plan_2048": lambda: chunk_plan(docs, 2048)
        .agg({"last_chunk": "max"})
        .collect()[0][0],
        "mix_corpus_T2": lambda: mix_corpus(docs, temperature=2.0).count(),
        "shuffle_rows": lambda: shuffle_rows(docs).count(),
        "semantic_dedup_t095": lambda: semantic_dedup(
            emb, threshold=0.95, n_clusters=32
        ).count(),
        "ivf_pq_build": lambda: build_ivf_pq_index(
            emb, "/tmp/llm_probe_ivfpq", n_lists=16, m=8, n_codes=64
        )["n_vectors"],
        "ivf_pq_query10": lambda: query_ivf_pq_index(
            emb.limit(10), "/tmp/llm_probe_ivfpq", k=5, nprobe=4
        ).count(),
    }
    timings: dict[str, float] = {}
    for name, fn in ops.items():
        start = time.time()
        result = fn()
        timings[name] = round(time.time() - start, 3)
        print(f"{name}: {timings[name]}s -> {result}", flush=True)
    print(
        json.dumps(
            {
                "metric": "llm_ops_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "ops": timings,
                "n_docs": n_docs,
                "n_embeddings": n_emb,
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
