#!/usr/bin/env python
"""Probe Spark's engine-native runtime filtering at sf0.1 — the two
mechanisms that replace hand-written pre-filters at cluster scale:

1. **Dynamic partition pruning (DPP)**: a join against a filtered dim
   prunes the fact's hive partitions at RUNTIME (the dim filter's
   matching keys are computed first and become a partition predicate).
   Probed on a year-partitioned copy of lineitem joined to a
   single-year date dim: the scan should read 1 of N year partitions.

2. **Runtime bloom-filter join pruning** (`spark.sql.optimizer.runtime.
   bloomFilter.enabled`, on by default in Spark 4): a selective dim
   side injects a bloom filter into the fact scan, dropping non-joining
   rows BEFORE the shuffle. Probed on orders(selective filter) ⋈
   lineitem with broadcast disabled so the shuffle is real; evidence is
   the `bloomfilter_might_contain` predicate in the physical plan and
   the shuffle-side row reduction.

Writes a short report to stdout; BASELINE.md records the numbers. This
is evidence that the repo leans on Catalyst's runtime re-planning
(AQE + DPP + bloom injection) instead of hand-scheduling — the configs
are the session defaults, not probe-only overrides (except where the
probe must FORCE the non-broadcast path to make the mechanism visible).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(app_name="runtime-filter-probe")
    tmp = tempfile.mkdtemp(prefix="rf_probe_")
    try:
        # ---- DPP: year-partitioned fact + filtered dim ----
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        (
            li.withColumn("ship_year", F.year("l_shipdate"))
            .write.mode("overwrite")
            .partitionBy("ship_year")
            .parquet(f"{tmp}/li_part")
        )
        fact = spark.read.parquet(f"{tmp}/li_part")
        # The dim must carry the selective predicate on a NON-join
        # column read from storage — a filter Catalyst can constant-fold
        # onto the join key (e.g. ship_year == 1997) becomes STATIC
        # partition pruning and DPP never needs to fire. Here the
        # pruning key values are only known after scanning the dim.
        (
            fact.select("ship_year").distinct()
            .withColumn("tag", F.concat(F.lit("y"), F.col("ship_year")))
            .write.mode("overwrite").parquet(f"{tmp}/year_dim")
        )
        years = spark.read.parquet(f"{tmp}/year_dim")
        n_years = years.count()
        j = fact.join(years.filter(F.col("tag") == "y1997"), "ship_year")
        plan = j._jdf.queryExecution().executedPlan().toString()
        dpp = "dynamicpruning" in plan.lower()
        t0 = time.perf_counter()
        rows = j.count()
        dpp_sec = time.perf_counter() - t0
        print(f"DPP: partitions={n_years}, plan has dynamicpruning={dpp}, "
              f"joined rows={rows}, wall={dpp_sec:.2f}s")

        # ---- runtime bloom filter: selective dim, forced shuffle join ----
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").filter(
            F.col("o_totalprice") > 400000
        )
        with_bloom = {}
        # Two injection gates default to cluster scale: the application
        # side must scan > 10GB, and the creation side must NOT be
        # broadcastable (InjectRuntimeFilter skips probably-broadcast
        # joins — a broadcast join never shuffles the fact, so a bloom
        # buys little). At 100 TB both hold automatically (the fact
        # dwarfs 10GB; a billion-row dim can't broadcast); at sf0.1 the
        # probe lowers the scan gate and disables auto-broadcast to
        # stage the same situation (same spirit as the AQE skew probe:
        # the engine defaults are right at cluster scale, the probe
        # sizes them to the local data to prove the machinery works).
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for flag in ("true", "false"):
            spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", flag)
            q = li.join(
                sel, li.l_orderkey == sel.o_orderkey
            ).groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
            plan = q._jdf.queryExecution().optimizedPlan().toString()
            has_bf = "bloom" in plan.lower()
            t0 = time.perf_counter()
            q.write.format("noop").mode("overwrite").save()
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            q.write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0
            with_bloom[flag] = (has_bf, cold, warm)
            print(f"bloom={flag}: plan has might_contain={has_bf}, "
                  f"cold={cold:.2f}s warm={warm:.2f}s")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        on, off = with_bloom["true"], with_bloom["false"]
        print(f"SUMMARY dpp={dpp} bloom_injected={on[0]} "
              f"bloom_warm={on[2]:.2f}s nobloom_warm={off[2]:.2f}s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
