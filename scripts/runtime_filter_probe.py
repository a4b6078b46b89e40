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
        years = (
            fact.select("ship_year").distinct()
            .withColumn("is_focus", F.col("ship_year") == 1997)
        )
        n_years = years.count()
        j = fact.join(years.filter("is_focus"), "ship_year")
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
        for flag in ("true", "false"):
            spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", flag)
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
                "100MB",
            )
            spark.conf.set(
                "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
                "false" if flag == "true" else "false",
            )
            q = li.join(
                sel.hint("merge"), li.l_orderkey == sel.o_orderkey
            ).groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
            plan = q._jdf.queryExecution().executedPlan().toString()
            has_bf = "bloomfilter_might_contain" in plan.lower()
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
