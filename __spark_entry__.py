"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 to a (spark, sf_dir) ->
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent ANSI
SQL for the correctness gate. Implementations live in
``quantlab_data_pipeline_spark.queries`` (relational operators) and
``quantlab_data_pipeline_spark.llm`` (training-data-pipeline ops).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from quantlab_data_pipeline_spark.queries import ORACLE_SQL, SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from quantlab_data_pipeline_spark.queries import q5_local_supplier

    return q5_local_supplier(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may hand us a session without our defaults:
            # nanos-as-long makes the events table readable at all, and
            # a UTC session timezone keeps timestamp values bit-identical
            # with the (timezone-naive) DuckDB oracle. Both are
            # runtime-settable SQL confs.
            for k, v in (
                ("spark.sql.legacy.parquet.nanosAsLong", "true"),
                ("spark.sql.session.timeZone", "UTC"),
            ):
                try:
                    spark.conf.set(k, v)
                except Exception:
                    pass
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in SPARK_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key."""
    return dict(ORACLE_SQL)
