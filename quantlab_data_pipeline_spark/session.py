"""SparkSession factory for the engine.

Local-mode defaults are tuned for the test/bench environment
(``local[32]``, single JVM); the same settings scale to a real cluster
because they only touch planner behavior (AQE, broadcast threshold,
shuffle-partition sizing), not cluster topology.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "quantlab_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults chosen for 100 TB-readiness:

    - AQE on (runtime coalescing, skew-join splitting, dynamic join
      strategy switch).
    - ``spark.sql.shuffle.partitions`` sized to the local core count in
      tests; on a cluster this should be ~2-3x total cores (AQE coalesces
      down, so slightly-too-many is the safe direction).
    - UTC session timezone so timestamps compare bit-for-bit with
      external oracles (DuckDB is UTC-naive).
    - Arrow enabled for every pandas interchange (toPandas, pandas UDFs).
    - ``SPARK_GRAFT_INITIAL_PARTITIONS`` overrides the AQE
      pre-coalesce reducer count (default 8x cores). The default is
      cluster-sized — the 64x scaling probe showed big fact-fact
      shuffles need it — but at toy scale 256 reducer partitions cost
      ~20% in pure scheduling, so data-sized callers (bench.py sizes
      it from the input bytes at ~64MB per partition) can hand the
      right number in, exactly as a cluster job sizes its shuffles.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Start shuffles wide and let AQE coalesce down: a fixed
        # core-count partitioning spills once per-partition data
        # outgrows memory (scripts/scaling_probe.py shows a 64x fact
        # join going 19.5s -> 2.9s with wider shuffles). The high
        # initial number costs nothing on small data because AQE
        # merges tiny partitions after each stage.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get(
                "SPARK_GRAFT_INITIAL_PARTITIONS", str(int(cpus) * 8)
            ),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # zstd: ~30% smaller than snappy at comparable scan speed — at
        # the 100 TB design point that is tens of TB of storage and
        # shuffle-read bandwidth.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Read TIMESTAMP(NANOS) parquet columns as long (nanos since epoch);
        # convert with sources.read_table's ns->ts normalization.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
