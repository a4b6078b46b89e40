"""Runnable demo of the training-data pipeline over the driver test
tables — the corpus-side twin of ``demo_data_handler.py``.

Run:
    python notebooks/demo_corpus_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from quantlab_data_pipeline_spark.llm import (  # noqa: E402
    dedup_lines,
    exact_dedup,
    mix_corpus,
    pack_documents,
    shuffle_rows,
    with_gopher_keep,
)
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402
from quantlab_data_pipeline_spark.sources.testdata import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="demo-corpus-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    keepers = exact_dedup(docs).select(F.col("keeper_id").alias("doc_id"))
    docs = docs.join(keepers, "doc_id", "left_semi")
    n1 = docs.count()

    docs = dedup_lines(docs)
    dropped_lines = docs.agg(F.sum("n_lines_dropped")).collect()[0][0]

    docs = with_gopher_keep(docs).filter("gopher_keep").select(
        "doc_id", "text", "source"
    )
    n2 = docs.count()

    docs = mix_corpus(docs, temperature=2.0)
    n3 = docs.count()

    # few docs per partition underfill packs; a small corpus packs tighter
    # with fewer partitions (at scale, partitions hold millions of tokens
    # each and the default parallelism is right)
    packed = pack_documents(shuffle_rows(docs), max_tokens=2048, partitions=2)
    n_packs = packed.select("pack_id").distinct().count()
    fill = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("fill"))
    avg_fill = fill.agg(F.avg("fill")).collect()[0][0]

    print(f"documents:            {n0}")
    print(f"after exact dedup:    {n1}")
    print(f"duplicate lines cut:  {dropped_lines}")
    print(f"after gopher filter:  {n2}")
    print(f"after T=2 mixing:     {n3}")
    print(f"packs (2048 tokens):  {n_packs}, avg fill {avg_fill:.0f}")


if __name__ == "__main__":
    main()
