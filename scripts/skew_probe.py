"""Skew-join probe: measure what AQE skew handling and salting are
worth on a deliberately skewed fact-dim join.

Builds a fact where HALF the rows carry one hot key (the celebrity /
default-value skew every real corpus has), forces a shuffle join
(broadcast disabled — the dim is the stand-in for a dim too large to
broadcast), and times three strategies:

1. plain sort-merge join, AQE skew-join splitting ON (the session
   default this repo ships);
2. the same join with AQE skew splitting OFF — the one-hot-task
   baseline;
3. ``operators.skew.salted_join`` — the explicit salting fallback for
   engines/paths where AQE cannot help (e.g. skewed aggregations
   feeding a join, or non-AQE-eligible plans).

Usage: python scripts/skew_probe.py [fact_rows] (default 6_400_000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.operators.skew import salted_join  # noqa: E402
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_400_000
    n_keys = 100_000
    spark = get_spark()
    spark.range(1).count()

    # 50% of rows on key 0, the rest uniform over the key space
    fact = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .cast("long")
            .alias("key"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .persist()
    )
    dim = (
        spark.range(n_keys)
        .select(F.col("id").alias("key"), (F.col("id") % 7).alias("w"))
        .persist()
    )
    fact.count(), dim.count()

    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        results = {}
        # two executions per strategy; report the second (steady state,
        # codegen compiled) so ordering doesn't bias the comparison
        for label, skew_on in (("aqe_skew_on", "true"), ("aqe_skew_off", "false")):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
            for _ in range(2):
                t0 = time.time()
                fact.join(dim, "key").agg(
                    F.sum(F.col("v") * F.col("w"))
                ).collect()
                results[label] = round(time.time() - t0, 2)
        # AQE with thresholds sized to the data (the defaults target
        # 256MB partitions and never fire at probe scale)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        for _ in range(2):
            t0 = time.time()
            fact.join(dim, "key").agg(F.sum(F.col("v") * F.col("w"))).collect()
            results["aqe_skew_tuned"] = round(time.time() - t0, 2)
        for k, v in (
            ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m"),
            ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5"),
            ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"),
        ):
            spark.conf.set(k, v)
        for _ in range(2):
            t0 = time.time()
            salted_join(fact, dim, on=["key"], salt_n=32).agg(
                F.sum(F.col("v") * F.col("w"))
            ).collect()
            results["salted_32"] = round(time.time() - t0, 2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    print(json.dumps({"fact_rows": n, "hot_share": 0.5, **results}))


if __name__ == "__main__":
    main()
