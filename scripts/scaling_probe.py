"""Scale-up probe: replicate the sf0.1 facts Nx into /tmp and time the
two heaviest headline queries at each multiple. Near-linear growth
means the plans have no super-linear stage (no blowup join, no
driver-side collect) — the property that decides whether a plan
survives 100x data.

Usage: python scripts/scaling_probe.py [multiples ...]  (default 1 4 16)
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
WORK = Path("/tmp/scaling_probe")


def replicate(spark, table: str, mult: int, key_cols: list[str]) -> str:
    """Union the table with itself ``mult`` times, offsetting keys per
    copy so join fan-out stays realistic (same matches per key)."""
    out = WORK / f"{table}_x{mult}.parquet"
    if out.exists():
        return str(out)
    base = spark.read.parquet(f"{SRC}/{table}.parquet")
    offset = 10_000_000
    copies = [
        base.select(
            *[
                (F.col(c) + F.lit(i * offset)).alias(c) if c in key_cols else F.col(c)
                for c in base.columns
            ]
        )
        for i in range(mult)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.write.mode("overwrite").parquet(str(out))
    return str(out)


def q1_like(spark, li_path: str) -> None:
    li = spark.read.parquet(li_path)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum(disc), F.avg("l_discount"), F.count("*"))
        .write.format("noop").mode("overwrite").save()
    )


def join_like(spark, li_path: str, orders_path: str) -> None:
    li = spark.read.parquet(li_path)
    orders = spark.read.parquet(orders_path)
    (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*"), F.sum("l_extendedprice"))
        .write.format("noop").mode("overwrite").save()
    )


def main() -> None:
    mults = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="scaling-probe")
    WORK.mkdir(parents=True, exist_ok=True)
    results = []
    for m in mults:
        li = replicate(spark, "lineitem", m, ["l_orderkey"])
        orders = replicate(spark, "orders", m, ["o_orderkey"])
        t0 = time.perf_counter(); q1_like(spark, li); t_agg = time.perf_counter() - t0
        t0 = time.perf_counter(); join_like(spark, li, orders); t_join = time.perf_counter() - t0
        rows = m * 600_000
        results.append(
            {"mult": m, "lineitem_rows": rows,
             "agg_s": round(t_agg, 3), "join_s": round(t_join, 3)}
        )
        print(f"x{m:3d} ({rows:>9,} rows)  agg={t_agg:6.3f}s  join={t_join:6.3f}s")
    print(json.dumps(results))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
