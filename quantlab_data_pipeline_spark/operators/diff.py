"""Snapshot diff: derive a change feed from two table states.

Pipelines that only receive periodic full dumps (the WRDS situation —
the reference re-ingests complete tables every run,
`/root/reference/src/data_pipeline/ingestion/wrds_ingestion.py`) still
need incremental downstream processing; the bridge is diffing
consecutive snapshots into inserts/updates/deletes — the change feed
that drives the SCD2 merge (operators/scd2.py) and the rollup refresh
(storage/rollup.py) without a CDC-enabled source.

Spark-first shape: ONE full-outer equi-join on the key columns, then
pure expressions classify each row and list the changed columns.
Cost is a single keyed shuffle of |old| + |new|; at 100 TB, bucketed
or identically-partitioned snapshots make it shuffle-free
(storage/bucketing.py), and unchanged rows can be filtered before the
shuffle when a row-hash column is maintained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key of two snapshots as insert / delete / update
    (/ unchanged).

    Output: ``keys + (change_type, changed_cols, old_<c>, new_<c> for
    each compared column)``. ``changed_cols`` is the sorted list of
    compared columns whose values differ (null-safe: null→value and
    value→null are changes, null→null is not); empty for inserts and
    deletes, whose per-column old/new sides are null anyway.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")
    diffs = F.sort_array(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(F.size(diffs) > 0, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.withColumn("change_type", change).withColumn(
        "changed_cols",
        F.when(F.col("change_type") == "update", diffs).otherwise(
            F.array().cast("array<string>")
        ),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out.select(
        *keys,
        "change_type",
        "changed_cols",
        *[c for pair in compare_cols for c in (f"old_{pair}", f"new_{pair}")],
    )
