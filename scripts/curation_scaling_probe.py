#!/usr/bin/env python
"""1M-doc scale probe for the CC-backed curation family (VERDICT r5 #8).

The registry checks these ops at 500-60k docs; this probe runs the
same composition — n-gram Jaccard pairs -> connected components ->
keep-best winners / cluster-keyed leakage-safe split — on a SYNTHETIC
1M-doc corpus with planted near-dup clusters, and verifies:

1. wall time per stage (the evidence BASELINE.md commits);
2. cluster integrity on the planted groups: every planted triple lands
   in ONE cluster, exactly one keeper per cluster;
3. leakage safety: no planted cluster straddles train/test.

Corpus shape: ~70% unique docs (hash-derived token soup, 30-60 words),
~10% planted clusters of 3 (one original + two near-copies differing
in 2 trailing words — Jaccard ~0.9, well above the 0.5 threshold).
Deterministic (md5/xxhash-derived), so reruns are comparable.

Usage: python scripts/curation_scaling_probe.py [n_docs]
       (default 1_000_000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.llm.dedup import ngram_jaccard_pairs  # noqa: E402
from quantlab_data_pipeline_spark.llm.text import hash_uniform  # noqa: E402
from quantlab_data_pipeline_spark.operators.graph import (  # noqa: E402
    dedup_cluster_assignments,
)
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402


def synthetic_docs(spark, n: int):
    """~n docs: ids 0..n-1; ids ≡ 0 (mod 10) are cluster seeds whose
    two successors (+1, +2) are near-copies (same 38 leading words,
    2 distinct trailing words). All other ids are unique token soup.
    Text is built from hash-derived 5-char words so blocking (first
    40 chars) and shingling both engage realistically."""
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    is_copy = (F.col("doc_id") % 10).isin(1, 2)
    seed = F.when(is_copy, F.col("doc_id") - (F.col("doc_id") % 10)).otherwise(
        F.col("doc_id")
    )
    # 38 shared words keyed on the seed + 2 tail words keyed on the doc
    shared = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(38)),
            lambda i: F.substring(
                F.md5(F.concat(seed.cast("string"), F.lit(":"), i.cast("string"))),
                1,
                5,
            ),
        ),
        " ",
    )
    tail = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(2)),
            lambda i: F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#"), i.cast("string")
                    )
                ),
                1,
                5,
            ),
        ),
        " ",
    )
    return base.select(
        "doc_id", F.concat(shared, F.lit(" "), tail).alias("text")
    )


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 1)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="curation-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.storagelevel import StorageLevel

    docs = synthetic_docs(spark, n).persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = docs.count()
    report: dict = {"n_docs": n_docs}

    pairs, t_pairs = timed(
        lambda: ngram_jaccard_pairs(docs, block_chars=40, threshold=0.5).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    n_pairs = pairs.count()
    report["pairs_wall_s"] = t_pairs
    report["n_pairs"] = n_pairs

    clustered, t_cc = timed(
        lambda: dedup_cluster_assignments(docs, pairs)
        .select("doc_id", "cluster_id", "is_keeper")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_rows = clustered.count()
    report["cc_wall_s"] = t_cc
    assert n_rows == n_docs, (n_rows, n_docs)

    # keep-best winners (same argmax shape as dedup_keep_best_docs,
    # doc length as the quality stand-in — constant-free at this scale)
    def keep_best():
        q = docs.select("doc_id", F.length("text").alias("quality_score"))
        joined = clustered.join(q, "doc_id")
        best = (
            joined.groupBy("cluster_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("quality_score"), (-F.col("doc_id")).alias("__negid")
                    )
                ).alias("__b")
            )
            .select("cluster_id", (-F.col("__b.__negid")).alias("keeper_id"))
        )
        return joined.join(best, "cluster_id").filter(
            F.col("doc_id") == F.col("keeper_id")
        )

    winners, t_best = timed(lambda: keep_best().count())
    report["keep_best_wall_s"] = t_best
    report["n_winners"] = winners

    # leakage-safe split keyed on cluster_id
    def split():
        draw = hash_uniform("cluster_id", "probe-split")
        return clustered.select(
            "doc_id",
            "cluster_id",
            F.when(draw < 0.8, "train").when(draw < 0.9, "val").otherwise("test").alias("split"),
        )

    sp, t_split = timed(lambda: split().persist(StorageLevel.MEMORY_AND_DISK))
    sp.count()
    report["split_wall_s"] = t_split

    # --- invariants ---
    # planted triples resolve to one cluster with the seed as min id
    planted = clustered.filter(
        (F.col("doc_id") % 10) < 3
    )
    bad_clusters = (
        planted.withColumn("seed", F.col("doc_id") - (F.col("doc_id") % 10))
        .groupBy("seed")
        .agg(F.count_distinct("cluster_id").alias("k"))
        .filter(F.col("k") != 1)
        .count()
    )
    report["planted_clusters_split_across_components"] = bad_clusters
    # expected winner count: one per cluster = unique docs + planted clusters
    expected_clusters = clustered.select("cluster_id").distinct().count()
    report["n_clusters"] = expected_clusters
    report["winners_equal_clusters"] = winners == expected_clusters
    # no cluster straddles splits
    straddle = (
        sp.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") != 1)
        .count()
    )
    report["clusters_straddling_splits"] = straddle

    report["ok"] = (
        bad_clusters == 0 and straddle == 0 and winners == expected_clusters
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
