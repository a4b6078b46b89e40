"""Per-query Spark-vs-DuckDB timing at a given scale factor.

Usage: python scripts/bench_vs_duckdb.py [sf_dir]

DuckDB runs the oracle SQL (single-node vectorized C++ — a much
stronger single-node baseline than the reference's pandas); Spark runs
the registered DataFrame plan on local[*]. Spark carries ~0.3-2s fixed
per-job overhead at these tiny scales, which is the price of the
distributed runtime that DuckDB does not pay; the interesting signal is
how the gap shrinks as rows grow.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

from quantlab_data_pipeline_spark.queries import ORACLE_SQL, SPARK_QUERIES  # noqa: E402
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402
from quantlab_data_pipeline_spark.sources.testdata import TABLES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.range(1).count()  # JVM warm-up

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    rows = []
    for name, fn in SPARK_QUERIES.items():
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        t_spark = time.time() - t0
        t_duck = None
        if name in ORACLE_SQL:
            t0 = time.time()
            con.execute(ORACLE_SQL[name]).fetchall()
            t_duck = time.time() - t0
        rows.append(
            {
                "query": name,
                "spark_s": round(t_spark, 3),
                "duckdb_s": round(t_duck, 3) if t_duck is not None else None,
                "rows": n,
            }
        )
        duck = f"{t_duck:7.3f}" if t_duck is not None else "    n/a"
        print(f"{name:28s} spark={t_spark:7.3f}s duckdb={duck}s rows={n}")

    print(json.dumps({"sf_dir": sf_dir, "results": rows}))


if __name__ == "__main__":
    main()
