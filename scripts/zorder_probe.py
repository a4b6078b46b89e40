#!/usr/bin/env python
"""Measure the Z-order layout's actual file-skipping benefit, straight
from the parquet footers (no Spark metrics needed): write lineitem
(sf0.1) three ways — natural order, sorted by l_partkey (1-D), and
Z-ordered on (l_partkey, l_suppkey) — then, for a 2-D box predicate,
count the row groups whose min/max stats CANNOT be pruned.

This is exactly the arithmetic a stats-based reader (Spark parquet
filter pushdown, Iceberg/Delta file skipping) performs; fewer
surviving row groups = less IO, for any engine.

Usage: python scripts/zorder_probe.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, ".")

import pyarrow.parquet as pq  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def surviving_row_groups(path: str, lo_p, hi_p, lo_s, hi_s) -> tuple[int, int]:
    """(survivors, total): row groups whose [min, max] stats intersect
    the box predicate partkey in [lo_p, hi_p] AND suppkey in [lo_s, hi_s]."""
    total = survive = 0
    for f in sorted(Path(path).glob("*.parquet")):
        meta = pq.ParquetFile(f).metadata
        schema_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        pi, si = schema_idx["l_partkey"], schema_idx["l_suppkey"]
        for rg in range(meta.num_row_groups):
            total += 1
            sp = meta.row_group(rg).column(pi).statistics
            ss = meta.row_group(rg).column(si).statistics
            if sp is None or ss is None:
                survive += 1
                continue
            if sp.min <= hi_p and sp.max >= lo_p and ss.min <= hi_s and ss.max >= lo_s:
                survive += 1
    return survive, total


def main() -> None:
    from pyspark.sql import functions as F

    from quantlab_data_pipeline_spark.session import get_spark
    from quantlab_data_pipeline_spark.storage.bucketing import (
        write_range_clustered,
        write_zorder_clustered,
    )

    spark = get_spark(app_name="zorder-probe")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    stats = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    mnp, mxp, mns, mxs = stats
    # a ~10% x 10% box in the middle of the 2-D domain
    lo_p, hi_p = mnp + (mxp - mnp) * 45 // 100, mnp + (mxp - mnp) * 55 // 100
    lo_s, hi_s = mns + (mxs - mns) * 45 // 100, mns + (mxs - mns) * 55 // 100

    tmp = tempfile.mkdtemp(prefix="zp_")
    try:
        n_files = 32
        li.repartition(n_files).write.mode("overwrite").parquet(f"{tmp}/natural")
        write_range_clustered(li, f"{tmp}/sorted1d", ["l_partkey"], n_files=n_files)
        write_zorder_clustered(
            li, f"{tmp}/zorder", ["l_partkey", "l_suppkey"], n_files=n_files
        )
        cases = [
            ("both dims (10% x 10% box)", lo_p, hi_p, lo_s, hi_s),
            ("partkey only (10%)", lo_p, hi_p, mns, mxs),
            ("suppkey only (10%)", mnp, mxp, lo_s, hi_s),
        ]
        for label, a, b, c, d in cases:
            print(f"predicate on {label}:")
            for name in ("natural", "sorted1d", "zorder"):
                s, t = surviving_row_groups(f"{tmp}/{name}", a, b, c, d)
                print(f"  {name:9s}: {s}/{t} row groups survive "
                      f"({100.0 * s / t:.0f}% of the data read)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
