"""Gaps-and-islands operators: interval merging and type-2 slowly
changing dimensions.

The reference's validity-window machinery (SURVEY §2 J4/J6/J7/J8;
`/root/reference/src/data_pipeline/ingestion/wrds_ingestion.py:558-585`)
is the as-of special case of these two general shapes, which every
warehouse pipeline eventually needs:

* ``merge_intervals`` — collapse overlapping/touching per-key intervals
  into maximal disjoint spans (session stitching, coverage computation,
  outage windows).
* ``scd2_from_changelog`` — turn an event-level change log into a
  type-2 dimension: one row per (key, value-run) with half-open
  ``[valid_from, valid_to)`` windows and an ``is_current`` flag.

Both are two window passes + one aggregation over a single keyed
shuffle — no self-join, no range join, so per-key cost is O(n log n)
(the sort) and the plan survives a 100 TB fact: the only exchange is
``hashpartitioning(keys)`` and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    keys: list[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Collapse overlapping or touching intervals per key group.

    Classic gaps-and-islands: a new island starts where the interval's
    start exceeds the running max of all previous ends (strictly —
    touching intervals merge). Output: ``keys + (start_col, end_col,
    n_merged)`` with one row per maximal disjoint span. The result is
    deterministic even when inputs tie on ``start_col`` because merging
    is order-insensitive within an island.
    """
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    ).cast("int")
    return (
        df.withColumn("__new", new_island)
        .withColumn(
            "__island",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(*keys, "__island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__island")
    )


def scd2_from_changelog(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    attr_cols: list[str],
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 dimension from an attribute change log.

    Consecutive rows (per key, in ``ts_col`` order, with
    ``order_tiebreak`` columns pinning equal-timestamp order) whose
    ``attr_cols`` are all unchanged collapse into one version row:

    ``keys + attr_cols + (valid_from, valid_to, is_current)``

    with half-open ``[valid_from, valid_to)`` windows — each version
    ends exactly when the next begins, and the latest version has
    ``valid_to`` null / ``is_current`` true. Null-safe comparison means
    a null attribute is a value, not a wildcard (the same pinned-order
    discipline as the dedup family, operators/dedup.py).
    """
    tie = order_tiebreak or []
    w = Window.partitionBy(*keys).orderBy(ts_col, *tie)

    def _chg(c: str) -> Column:
        return ~F.col(c).eqNullSafe(F.lag(c).over(w))

    changed = _chg(attr_cols[0])
    for c in attr_cols[1:]:
        changed = changed | _chg(c)
    versions = (
        df.withColumn("__chg", changed.cast("int"))
        .withColumn(
            "__ver",
            F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(*keys, "__ver")
        .agg(
            F.min(ts_col).alias("valid_from"),
            # attrs are constant within a version; min is a cheap pick
            *[F.min(c).alias(c) for c in attr_cols],
        )
    )
    w2 = Window.partitionBy(*keys).orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w2)
    return versions.select(
        *keys,
        *attr_cols,
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
