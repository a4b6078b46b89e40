"""Scale-up probe for the round-9 operators: bloom-prefiltered
anti-join, n-gram novelty, crawl-frontier scheduling, and SFT
conversation assembly.

Same protocol as curation_ops_probe: replicate the sf0.1 documents
(or events) table Nx into /tmp with per-copy id offsets, time each
operator end-to-end through the noop sink at each multiple, print one
JSON line per (op, multiple). The claims under test:

- bloom: build cost tracks the REFERENCE size, probe cost tracks the
  corpus linearly (map-side), confirm join tracks the positive sliver;
- novelty: one gram-keyed shuffle — linear in gram volume;
- frontier: two range exchanges + broadcast offsets — linear, no
  host-sized task even with the planted hot host;
- sft: rank + bounded collect_list — linear in events, grouped state
  capped by max_turns.

Usage: python scripts/round9_ops_probe.py [multiples ...] (default 1 4 16)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.llm.bloom import (  # noqa: E402
    bloom_prefilter_anti_join,
)
from quantlab_data_pipeline_spark.llm.dedup import ngram_novelty  # noqa: E402
from quantlab_data_pipeline_spark.llm.sft import (  # noqa: E402
    assemble_conversations,
)
from quantlab_data_pipeline_spark.llm.urls import (  # noqa: E402
    frontier_schedule,
)
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
WORK = Path("/tmp/round9_ops_probe")


def replicate_docs(spark, mult: int) -> str:
    out = WORK / f"documents_x{mult}.parquet"
    if out.exists():
        return str(out)
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    n = base.agg(F.max("doc_id")).collect()[0][0] + 1
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


def replicate_events(spark, mult: int) -> str:
    out = WORK / f"events_x{mult}.parquet"
    if out.exists():
        return str(out)
    base = spark.read.parquet(f"{SRC}/events.parquet")
    mx = base.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).collect()[0]
    copies = spark.range(mult).select(F.col("id").alias("__copy"))
    df = base.crossJoin(copies).select(
        (F.col("event_id") + F.col("__copy") * F.lit(mx["e"] + 1)).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("__copy") * F.lit(mx["u"] + 1)).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )
    df.repartition(max(32, mult // 8)).write.mode("overwrite").parquet(
        str(out)
    )
    return str(out)


def timed(name: str, mult: int, df) -> None:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(
        json.dumps(
            {
                "op": name,
                "mult": mult,
                "sec": round(time.perf_counter() - t0, 2),
            }
        ),
        flush=True,
    )


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="round9-ops-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for mult in mults:
        docs = spark.read.parquet(replicate_docs(spark, mult))
        ev = spark.read.parquet(replicate_events(spark, mult))

        ref = docs.filter(F.col("doc_id") % 7 == 0).select(
            F.col("text").alias("key")
        )
        corpus = docs.select("doc_id", F.col("text").alias("key"))
        timed(
            "bloom_prefilter",
            mult,
            bloom_prefilter_anti_join(
                corpus, ref, "key", num_bits=1 << 20, num_hashes=3
            ),
        )

        timed(
            "ngram_novelty",
            mult,
            ngram_novelty(docs, docs.filter(F.col("doc_id") % 7 == 0), k=3),
        )

        base = docs.select(
            "doc_id",
            F.when(F.col("doc_id") % 4 == 0, F.lit("bighost"))
            .otherwise(
                F.concat(F.lit("h"), (F.col("doc_id") % 9973).cast("string"))
            )
            .alias("host"),
            ((F.col("doc_id") * F.lit(2654435761)) % 100).alias("priority"),
        )
        timed(
            "frontier_schedule",
            mult,
            frontier_schedule(
                base, host_col="host", priority_col="priority",
                id_col="doc_id",
            ),
        )

        role = F.when(
            F.col("event_type").isin("click", "view", "signup"),
            F.lit("user"),
        ).otherwise(F.lit("assistant"))
        content = F.concat(
            F.col("event_type"),
            F.lit(":"),
            F.floor(F.col("value") * 100 + 0.5).cast("string"),
        )
        timed(
            "sft_assembly",
            mult,
            assemble_conversations(
                ev,
                convo_col="user_id",
                ts_col="ts",
                id_col="event_id",
                role=role,
                content=content,
                max_turns=16,
            ),
        )


if __name__ == "__main__":
    main()
