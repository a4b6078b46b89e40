"""Group-wise null imputation: the feature-preprocessing step between a
raw fact table and a model — fill nulls with a per-group statistic
(median / mean / mode) instead of a global constant, so a sparse
sensor/asset/user inherits its OWN group's typical value.

Scale shape: one groupBy computes every requested statistic in a single
aggregate (the stats frame is group-cardinality-sized — thousands of
rows, not billions), then one keyed equi-join attaches it back. Two
shuffles total regardless of how many columns are imputed; no window
over the fact, no driver collect.

Engine-reproducibility notes (the oracle discipline of this repo):
* ``median`` is an exact order statistic (Spark ``median`` = exact
  interpolated percentile 0.5, same as DuckDB) — deterministic and
  engine-identical on the same rows.
* ``mode`` ties are broken toward the SMALLEST value (Spark's built-in
  ``mode()`` leaves ties nondeterministic, so it is computed here as a
  count + ordered row_number instead).
* ``mean`` sums doubles — the result depends on partial-aggregation
  order in the last bits; fine for model features, but an oracle
  comparison needs rounding. The registry query uses median/mode only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["impute_by_group"]

_STRATEGIES = {"median", "mean", "mode"}


def impute_by_group(
    df: DataFrame,
    group_cols: list[str],
    columns: dict[str, str],
    flag_suffix: str | None = "_was_null",
) -> DataFrame:
    """Fill nulls in each ``columns`` key with its group's statistic
    (value ``"median"`` | ``"mean"`` | ``"mode"``).

    Adds ``<col><flag_suffix>`` boolean markers (pass ``None`` to skip)
    so downstream consumers can distinguish observed from imputed — the
    flag itself is a standard model feature. Groups that are entirely
    null keep their nulls (no global fallback is silently invented);
    chain a second global pass if a total fill is required.
    """
    bad = {c: s for c, s in columns.items() if s not in _STRATEGIES}
    if bad:
        raise ValueError(f"unknown strategies {bad}; pick from {sorted(_STRATEGIES)}")

    agg_exprs = []
    for c, strat in columns.items():
        if strat == "median":
            agg_exprs.append(F.median(c).alias(f"__fill_{c}"))
        elif strat == "mean":
            agg_exprs.append(F.avg(c).alias(f"__fill_{c}"))
    stats = df.groupBy(*group_cols).agg(*agg_exprs) if agg_exprs else None

    out = df
    if stats is not None:
        out = out.join(stats, group_cols, "left")

    for c, strat in columns.items():
        if strat == "mode":
            counts = (
                df.filter(F.col(c).isNotNull())
                .groupBy(*group_cols, c)
                .agg(F.count(F.lit(1)).alias("__cnt"))
            )
            w = Window.partitionBy(*group_cols).orderBy(
                F.desc("__cnt"), F.asc(c)
            )
            modes = (
                counts.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select(*group_cols, F.col(c).alias(f"__fill_{c}"))
            )
            out = out.join(modes, group_cols, "left")

    for c in columns:
        if flag_suffix:
            out = out.withColumn(f"{c}{flag_suffix}", F.col(c).isNull())
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__fill_{c}")))
    return out.drop(*[f"__fill_{c}" for c in columns])
