"""Scale-up probe for the round-8 curation operators: DSIR selection,
token-budget mixing, per-domain boilerplate removal, and the domain
blocklist join.

Replicates the sf0.1 documents table Nx into /tmp (doc_id offset per
copy so id-derived salts/urls stay distinct; source strings get a
per-copy suffix so domain cardinality grows with data, as a real
multi-crawl corpus would) and times each operator at each multiple.
All four are bounded-shuffle plans — feature/count tables, suffix
chains, line keys — so growth should track data volume with no
super-linear stage.

Usage: python scripts/curation_ops_probe.py [multiples ...] (default 1 4 16)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.llm.dedup import boilerplate_lines  # noqa: E402
from quantlab_data_pipeline_spark.llm.dsir import dsir_select  # noqa: E402
from quantlab_data_pipeline_spark.llm.mixing import token_budget_mix  # noqa: E402
from quantlab_data_pipeline_spark.llm.urls import blocklist_filter  # noqa: E402
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
WORK = Path("/tmp/curation_ops_probe")


def replicate(spark, mult: int) -> str:
    out = WORK / f"documents_x{mult}.parquet"
    if out.exists():
        return str(out)
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    n = base.agg(F.max("doc_id")).collect()[0][0] + 1
    # crossJoin with a copies range instead of an N-way union: at the
    # round-9 multiples (200-600 copies = 1-3M docs) a union plan that
    # wide is itself the bottleneck.
    copies = spark.range(mult).select(F.col("id").alias("__copy"))
    df = base.crossJoin(copies).select(
        (F.col("doc_id") + F.col("__copy") * F.lit(n)).alias("doc_id"),
        "text",
        "lang",
        F.concat(
            F.col("source"), F.lit("_c"), F.col("__copy").cast("string")
        ).alias("source"),
        "n_chars",
    )
    df.repartition(max(32, mult // 8)).write.mode("overwrite").parquet(
        str(out)
    )
    return str(out)


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "4", "16"])]
    spark = get_spark(app_name="curation-ops-probe")
    WORK.mkdir(exist_ok=True)
    results = []
    for m in mults:
        path = replicate(spark, m)
        docs = spark.read.parquet(path)
        n_docs = docs.count()

        target = docs.filter(F.col("lang") == "en")
        raw = docs.filter(F.col("lang") != "en")
        t_dsir = timed(lambda: noop(dsir_select(raw, target, frac=0.25)))

        # The documented iterating-caller escape hatch: the per-doc
        # (id, bucket, cnt) feature frames precomputed once (NOT in the
        # timer), so the select step skips the corpus re-explode
        # (VERDICT r8 item 6).
        from quantlab_data_pipeline_spark.llm.dsir import hashed_ngram_counts

        def _counts(df):
            c = hashed_ngram_counts(df, buckets=4096, ns=(1, 2))
            c.persist().count()
            return c

        rc, tc = _counts(raw), _counts(target)
        t_dsir_pre = timed(
            lambda: noop(
                dsir_select(
                    raw, target, frac=0.25, raw_counts=rc, target_counts=tc
                )
            )
        )
        rc.unpersist()
        tc.unpersist()

        t_budget = timed(lambda: noop(token_budget_mix(docs, 600)))

        j = F.floor(F.col("doc_id") / 20)
        page = F.concat_ws(
            "\n",
            F.concat(F.lit("HEADER "), F.col("source")),
            F.col("text"),
            F.when((j % 5) == 0, F.concat(F.lit("PROMO "), F.col("source"))),
            F.when((j % 2) == 0, F.concat(F.lit("FOOTER "), F.col("source"))),
        )
        framed = docs.select("doc_id", "source", page.alias("text"))
        t_bp = timed(lambda: noop(boilerplate_lines(framed)))

        url = F.concat(
            F.lit("https://sub"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit(".dom"),
            (F.col("doc_id") % 5000).cast("string"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
        )
        with_urls = docs.withColumn("url", url)
        # domain blocklist scaled with the corpus: 10k listed domains
        bl = spark.range(10_000).select(
            F.concat(F.lit("dom"), F.col("id").cast("string"), F.lit(".com")).alias(
                "domain"
            )
        )
        t_bl = timed(
            lambda: noop(blocklist_filter(with_urls, bl).filter("blocked"))
        )

        # Round-9 third wave: output sharding, attribution, fertility,
        # normalization — all bounded-shuffle or shuffle-free plans.
        from quantlab_data_pipeline_spark.llm.dedup import dup_attribution
        from quantlab_data_pipeline_spark.llm.sharding import (
            content_fingerprint,
            shard_assign,
            shard_manifest,
        )
        from quantlab_data_pipeline_spark.llm.text import (
            tokenizer_fertility,
            with_normalized_text,
        )

        sized = docs.withColumn(
            "bytes",
            (F.coalesce(F.octet_length("text"), F.lit(0)) + F.lit(64)).cast(
                "long"
            ),
        )
        t_shard = timed(
            lambda: noop(
                shard_manifest(
                    shard_assign(
                        sized,
                        "bytes",
                        1 << 20,
                        [
                            F.md5(F.col("doc_id").cast("string")).asc(),
                            F.col("doc_id").asc(),
                        ],
                    ),
                    content_fingerprint(
                        F.coalesce(F.col("text"), F.lit(""))
                    ),
                    "bytes",
                )
            )
        )
        attrib = docs.withColumn(
            "content",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("tpl:"), (F.col("doc_id") % 9973).cast("string")
                ),
            ).otherwise(F.col("text")),
        )
        t_attr = timed(
            lambda: noop(dup_attribution(attrib, text_col="content"))
        )
        t_fert = timed(
            lambda: noop(tokenizer_fertility(docs, ["source", "lang"]))
        )
        t_norm = timed(lambda: noop(with_normalized_text(docs)))

        row = {
            "mult": m,
            "n_docs": n_docs,
            "dsir_select": t_dsir,
            "dsir_select_precounts": t_dsir_pre,
            "token_budget_mix": t_budget,
            "boilerplate_lines": t_bp,
            "blocklist_filter": t_bl,
            "shard_manifest": t_shard,
            "dup_attribution": t_attr,
            "tokenizer_fertility": t_fert,
            "text_normalize": t_norm,
        }
        results.append(row)
        print(json.dumps(row))
    print(json.dumps({"probe": "curation_ops", "results": results}))


if __name__ == "__main__":
    main()
