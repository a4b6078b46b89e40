#!/usr/bin/env python
"""Time a named subset of registry queries with bench.py's exact
methodology (noop sink, cold + min-of-2 steady) — the A/B harness for
optimization work. Does NOT replace bench.py; it exists so a
before/after comparison of a few heavy rows doesn't cost a full bench.

Usage: python scripts/bench_subset.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    if "SPARK_GRAFT_INITIAL_PARTITIONS" not in os.environ:
        total = sum(f.stat().st_size for f in Path(SF_DIR).glob("*.parquet"))
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        sized = max(cpus, min(8 * cpus, total // (64 << 20) + 1))
        os.environ["SPARK_GRAFT_INITIAL_PARTITIONS"] = str(sized)

    from quantlab_data_pipeline_spark.queries import SPARK_QUERIES
    from quantlab_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-subset")
    print(f"loadavg_start={round(os.getloadavg()[0], 2)}", file=sys.stderr)
    # same warmup as bench.py (JVM + codegen paths)
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
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = SPARK_QUERIES[name]
        spark.sparkContext.setJobDescription(f"subset:{name}:cold")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        steady = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"subset:{name}:steady{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            steady.append(time.perf_counter() - t0)
        out[name] = {
            "cold": round(cold, 3),
            "steady": round(min(steady), 3),
            "runs": [round(s, 3) for s in steady],
        }
        print(f"{name}: cold={cold:.2f} steady={min(steady):.2f}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "queries": out}))


if __name__ == "__main__":
    main()
