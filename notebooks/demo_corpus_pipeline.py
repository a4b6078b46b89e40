"""Runnable demo: a pretraining-corpus curation pass, end to end, on
the driver's synthetic documents table — every step one lazy DataFrame
transform (the README snippet, executable).

    python notebooks/demo_corpus_pipeline.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from quantlab_data_pipeline_spark.llm import (  # noqa: E402
    dedup_lines,
    decontaminate,
    exact_dedup,
    mix_corpus,
    pack_documents,
    shuffle_rows,
    stratified_split,
    with_gopher_keep,
)
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402
from quantlab_data_pipeline_spark.sources.testdata import load_table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="demo-corpus")
    docs = load_table(spark, sf, "documents")
    n0 = docs.count()

    keep = exact_dedup(docs)
    deduped = docs.join(
        keep.selectExpr("keeper_id as doc_id"), "doc_id", "left_semi"
    )
    n1 = deduped.count()

    lined = dedup_lines(deduped)
    gophered = with_gopher_keep(lined).filter("gopher_keep")
    n2 = gophered.count()

    eval_df = docs.orderBy("doc_id").limit(20)  # stand-in benchmark set
    clean = decontaminate(gophered, eval_df).filter("NOT contaminated")
    n3 = clean.count()

    mixed = mix_corpus(clean, temperature=2.0)
    n4 = mixed.count()

    # Near-dup clusters: keep the highest-QUALITY doc per cluster
    # (round 3 — min-id keepers discard the clean original when a
    # mangled re-crawl has the smaller id), then split so whole
    # clusters stay on one side of the train/eval boundary.
    import pyspark.sql.functions as F
    from quantlab_data_pipeline_spark.llm.dedup import ngram_jaccard_pairs
    from quantlab_data_pipeline_spark.llm.text import (
        hash_uniform,
        with_quality_score,
    )
    from quantlab_data_pipeline_spark.operators.graph import (
        dedup_cluster_assignments,
    )

    pairs = ngram_jaccard_pairs(mixed, block_chars=40, threshold=0.5)
    clustered = dedup_cluster_assignments(mixed, pairs).select(
        "doc_id", "cluster_id"
    )
    q = with_quality_score(mixed).select("doc_id", "quality_score")
    best = (
        clustered.join(q, "doc_id")
        .groupBy("cluster_id")
        .agg(F.max(F.struct("quality_score", (-F.col("doc_id")).alias("n"))).alias("b"))
        .select("cluster_id", (-F.col("b.n")).alias("keeper_id"))
    )
    curated = mixed.join(
        clustered.join(best, "cluster_id")
        .filter("doc_id = keeper_id")
        .select("doc_id", "cluster_id"),
        "doc_id",
    )
    n5 = curated.count()
    leak_safe = curated.withColumn(
        "split",
        F.when(hash_uniform(F.col("cluster_id"), "leaksplit") < 0.1, "test")
        .when(hash_uniform(F.col("cluster_id"), "leaksplit") < 0.9, "train")
        .otherwise("valid"),
    )

    packed = pack_documents(
        shuffle_rows(leak_safe.filter("split = 'train'")), max_tokens=512
    )
    n6 = packed.count()
    n_packs = packed.select("pack_id").distinct().count()

    print(f"documents:            {n0}")
    print(f"after exact dedup:    {n1}")
    print(f"after line+gopher:    {n2}")
    print(f"after decontaminate:  {n3}")
    print(f"after T=2 mixing:     {n4}")
    print(f"after keep-best near-dup curation: {n5}")
    print(f"train docs packed:    {n6} into {n_packs} sequences of <=512 tokens")

    # unused import kept out: stratified_split remains the per-doc
    # alternative when leakage-safety is not required
    _ = stratified_split


if __name__ == "__main__":
    main()
