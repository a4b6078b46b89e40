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


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    attr_cols: list[str],
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Incrementally fold a batch of change-log rows into an existing
    SCD2 dimension — the warehouse MERGE-into-dimension pattern.

    Only keys present in the batch are rebuilt: their current version
    rows are replayed as change events (one per ``valid_from``),
    unioned with the batch, and re-run through
    :func:`scd2_from_changelog`; untouched keys pass through verbatim
    (a left-anti join, no rewrite). At 100 TB this means the merge
    cost scales with the CHANGED key set, not the dimension — the same
    touched-partition-only discipline as the rollup refresh
    (storage/rollup.py).

    Contract: batch rows must be at-or-after the key's latest
    ``valid_from`` in ``dim`` (the normal CDC-append case — any split
    of a change log at a time threshold satisfies it). Under that
    contract the tested invariant holds:
    ``scd2_apply_changes(scd2(initial), batch) == scd2(initial +
    batch)`` — a batch row inside the open current version splits it
    exactly as a full recompute would, and same-value runs collapse
    across the split. Mid-HISTORY corrections (a row older than an
    already-closed version) need a rebuild from the retained change
    log: the dim keeps only each version's first row, so the
    information to re-split a closed run is gone.
    """
    touched = changes.select(*keys).distinct()
    replayed = dim.join(touched, keys, "left_semi").select(
        *keys, F.col("valid_from").alias(ts_col), *attr_cols
    )
    merged_log = replayed.unionByName(
        changes.select(*keys, ts_col, *attr_cols)
    )
    rebuilt = scd2_from_changelog(
        merged_log, keys, ts_col, attr_cols, order_tiebreak
    )
    untouched = dim.join(touched, keys, "left_anti")
    return untouched.unionByName(rebuilt)
