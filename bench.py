#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the JVM-side noop sink (full plan
execution, no driver collect, no Python serialization in the timing).

MEASUREMENT PROTOCOL (VERDICT r7 item 3 — twice the committed bench
was taken under concurrent load and read as a regression): a BENCH_rN
meant for round-over-round comparison must run on an otherwise-idle
box — never concurrently with the mirror, pytest, or probes. The
1-minute load average at start is recorded in BENCH_DETAIL.json as
``loadavg_start`` and a loud stderr warning fires when it exceeds 2,
so a loaded run is self-evident in the committed artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_LOADAVG_START = round(os.getloadavg()[0], 2)
if _LOADAVG_START > 2:
    print(
        f"WARNING: loadavg {_LOADAVG_START} at bench start — numbers from "
        "a loaded box are NOT comparable round-over-round (see protocol "
        "note in the module docstring)",
        file=sys.stderr,
    )

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "q17_small_quantity",
    "interval_validity_join",
    "asof_join_events",
    "left_join_coalesce",
    "dedup_first_non_null",
    "window_cumprod",
    "sessionize_batch",
    "calendar_explode",
    "hourly_rollup",
    "topk_per_group",
    "text_quality",
    "exact_dedup_docs",
    "ngram_jaccard_dedup",
    "embedding_cosine_topk",
]

# Heavy round-2+ operator families (VERDICT r2 item 5): a second stable
# section so regressions in these plans are machine-comparable round
# over round, same timing protocol as the headline set. Kept separate
# so "value" stays comparable with BENCH_r01/r02.
EXTENDED = [
    "asof_forward_events",
    "merge_intervals_events",
    "scd2_events",
    "range_join_value_bands",
    "bm25_search_docs",
    "triangle_count_suppliers",
    "pagerank_suppliers",
    "dedup_clusters",
    "semantic_dedup_docs",
    "pack_documents_docs",
    "bigram_lm_docs",
    "minhash_lsh_dedup",
    "tfidf_keywords_docs",  # round 8: keyword extraction (postings twin)
    "hybrid_search_docs",  # round 8: BM25 + dense RRF fusion
    "embedding_pca_docs",  # round 8: one-pass PCA fit + whitened projection
    "hard_negatives_docs",  # round 8: contrastive hard-negative mining
    "embedding_drift_docs",  # round 9: exact integer embedding drift report
]

# Round-3 data-ops family — its own stable section so round-over-round
# comparison of the original 12 extended plans stays apples-to-apples.
#
# dedup_keep_best_docs / leakage_safe_split_docs (and extended's
# dedup_clusters) deliberately do NOT share their common pairs+CC
# prefix here: the driver's contract times each queries() entry as an
# independent plan from cold inputs, and pre-computing a shared prefix
# would make the bench measure a different (cached) workload than the
# correctness gate runs. A production pipeline SHOULD share it — the
# composition functions accept precomputed pairs/cluster frames — but
# the bench's job is to price each registry entry as registered.
CURATION = [
    "dedup_keep_best_docs",
    "leakage_safe_split_docs",
    "fuzzy_decontaminate_docs",
    "incremental_dedup_bucketed_docs",
    "psi_drift_events",
    "profile_drift_events",
    "join_profile_tpch",
    "simhash_dedup",
    "perplexity_bucket_docs",  # round 7: CCNet LM-perplexity terciles
    "quality_percentile_by_source_docs",  # round 8: per-source normalization
    "dsir_select_docs",  # round 8: DSIR importance resampling
    "token_budget_mix_docs",  # round 8: per-source token-budget fill
    "boilerplate_lines_docs",  # round 8: per-domain template-line removal
    "curate_corpus_r8",  # round 8: blocklist+boilerplate+dedup+budget composition
    "dsir_incremental_docs",  # round 8: persisted DSIR count model, fold-forward
    "bloom_prefilter_docs",  # round 9: bloom-prefiltered reference anti-join
    "filter_funnel_docs",  # round 9: filter-ablation funnel report
    "sft_assembly_events",  # round 9: conversation/SFT example assembly
    "shard_manifest_docs",  # round 9: size-balanced output sharding+manifest
    "dup_attribution_docs",  # round 9: cross-source duplicate attribution
    "tokenizer_fertility_docs",  # round 9: per-(source,lang) fertility table
    "dpo_pairs_events",  # round 9: preference-pair assembly
    "quality_calibration_docs",  # round 9: frozen-classifier calibration
]

# Round-6 intake family (own section, same reasoning as above): raw
# crawl-format parsing + main-content extraction + frozen-classifier
# scoring — the front of the pipeline.
INTAKE = [
    "html_extract_docs",
    "warc_extract_docs",
    "ml_quality_frozen_docs",
    "url_dedup_docs",
    "curate_corpus_docs",
    "image_dhash_dedup",
    "audio_dhash_dedup",
    "curate_corpus_full",  # round 7: full multimodal composition
    "media_index_dedup_docs",  # round 8: persisted perceptual index
    "media_intake_loop_docs",  # round 8: incremental intake loop replay
    "media_index_takedown_docs",  # round 8: tombstone mask + compaction
    "corpus_export_manifest_docs",  # round 8: JSONL export + manifest
    "url_blocklist_docs",  # round 8: domain blocklist suffix-chain join
    "curation_pipeline_loop_docs",  # round 9: full streamed-composition loop
    "frontier_schedule_docs",  # round 9: politeness-scheduled crawl frontier
    "link_graph_docs",  # round 9: href edge extraction + host aggregation
    "ngram_novelty_docs",  # round 9: per-doc novelty vs reference corpus
    "text_normalize_docs",  # round 9: portable pre-dedup normalization
    "shard_intake_loop_docs",  # round 9: incremental sharded-writer loop
]


def main() -> None:
    # Size the AQE pre-coalesce reducer count to the actual input bytes
    # (~64MB advisory per partition, floored at the core count so every
    # core engages) — what a cluster job does, instead of paying the
    # 8x-cores cluster default's scheduling overhead on toy data.
    if "SPARK_GRAFT_INITIAL_PARTITIONS" not in os.environ:
        total = sum(
            f.stat().st_size for f in Path(SF_DIR).glob("*.parquet")
        )
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        sized = max(cpus, min(8 * cpus, total // (64 << 20) + 1))
        os.environ["SPARK_GRAFT_INITIAL_PARTITIONS"] = str(sized)

    from quantlab_data_pipeline_spark.queries import SPARK_QUERIES
    from quantlab_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warm the JVM, parquet footers, AND the codegen/shuffle paths once
    # so per-query timings measure the plan, not first-use compilation
    # (an agg+join exercise compiles the hash-agg and broadcast-join
    # codepaths the headline queries reuse).
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # Same idea for the expression codepaths the text/embedding headliners
    # use (regex, higher-order array functions, window): compile each
    # codegen class once on a 100-row slice so their first timed use
    # measures the plan, not the JIT.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    (
        docs.select(
            F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias("nw"),
            F.aggregate(
                F.transform(F.sequence(F.lit(1), F.lit(4)), lambda i: i.cast("double")),
                F.lit(0.0),
                lambda a, v: a + v,
            ).alias("agg"),
            F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("doc_id")).alias("rn"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Two executions per query: the first pays one-time codegen/JIT
    # compilation for that plan shape (semantically part of the session,
    # not the query — on a real cluster a plan compiles once and then
    # runs over thousands of partitions); the second measures the
    # steady-state plan execution, which is what scales with data volume.
    # Both are reported: "value"/"queries" are steady-state, "cold_*"
    # keep the first-execution numbers honest.
    def run_set(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        timings: dict[str, float] = {}
        cold: dict[str, float] = {}
        for name in names:
            fn = SPARK_QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.perf_counter() - t0, 3)
            # steady-state = min of two executions: single runs on a
            # shared box jitter ±20% from GC/scheduler noise; the min is
            # the reproducible per-plan cost.
            steady = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                steady.append(time.perf_counter() - t0)
            timings[name] = round(min(steady), 3)
        return timings, cold

    timings, cold = run_set([n for n in HEADLINE if n in SPARK_QUERIES])
    ext_timings, ext_cold = run_set([n for n in EXTENDED if n in SPARK_QUERIES])
    cur_timings, cur_cold = run_set([n for n in CURATION if n in SPARK_QUERIES])
    in_timings, in_cold = run_set([n for n in INTAKE if n in SPARK_QUERIES])

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "loadavg_start": _LOADAVG_START,
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cold_total": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "extended_total": round(sum(ext_timings.values()), 3),
        "extended": ext_timings,
        "extended_cold_total": round(sum(ext_cold.values()), 3),
        "extended_cold": ext_cold,
        "curation_total": round(sum(cur_timings.values()), 3),
        "curation": cur_timings,
        "curation_cold_total": round(sum(cur_cold.values()), 3),
        "curation_cold": cur_cold,
        "intake_total": round(sum(in_timings.values()), 3),
        "intake": in_timings,
        "intake_cold_total": round(sum(in_cold.values()), 3),
        "intake_cold": in_cold,
        "sf": sf_val,
    }
    # Full per-query detail goes to a file (and an early stdout line for
    # humans); the FINAL stdout line is a compact headline JSON so a
    # tail-of-stdout capture always gets a complete, parseable object.
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    try:
        detail_path.write_text(json.dumps(detail, indent=1) + "\n")
    except OSError:
        pass
    print(json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": detail["value"],
                "unit": "sec",
                "queries": timings,
                "cold_total": detail["cold_total"],
                "extended_total": detail["extended_total"],
                "extended_cold_total": detail["extended_cold_total"],
                "curation_total": detail["curation_total"],
                "curation_cold_total": detail["curation_cold_total"],
                "intake_total": detail["intake_total"],
                "intake_cold_total": detail["intake_cold_total"],
                "detail": str(detail_path),
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
