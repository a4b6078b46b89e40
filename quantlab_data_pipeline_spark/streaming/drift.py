"""Streaming drift monitoring: windowed PSI against a frozen baseline.

The batch ``operators.profile.psi_drift`` compares two snapshots; the
production question is continuous — "is THIS hour's value distribution
still the one we trained/validated on?". Same two-step shape as the
windowed HLL sketches (cells in the stream, reduction at read time):

1. Freeze a baseline histogram ONCE (``baseline_histogram`` — equal
   width bins over the baseline's exact per-group min/max, the same
   engine-reproducible binning the batch op uses) as a small
   (group, bin, p_base) frame.
2. ``windowed_bin_counts`` maintains (window, group, bin) counts in
   the stream — ONE windowed aggregation (a second chained stream agg
   would not be append-safe), bucketing via a broadcast join against
   the frozen bin edges; state is O(windows_in_flight × groups ×
   bins), KB-scale, watermark-bounded, where a store-all-values
   monitor grows with the firehose.
3. ``psi_from_cells`` reduces cells to (window, group, psi) wherever
   batch semantics hold — ``foreachBatch``, a scheduled read of the
   sunk cells, or a plain batch frame. Baseline bins unseen in a
   window are restored exactly here (left join, count 0), so the
   statistic equals the batch op's, not a lower bound.

Works identically on a batch frame; the batch-twin test asserts
equality with ``psi_drift`` on the finite events file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["baseline_histogram", "windowed_bin_counts", "psi_from_cells"]


def _bin_idx(value_col: str, bins: int):
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    return (
        F.when(F.col("__hi") <= F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col(value_col) - F.col("__lo")) / width).cast(
                        "int"
                    ),
                ),
            )
        )
    )


def baseline_histogram(
    baseline: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """(group..., __bin, __lo, __hi, n_base, p_base): the frozen
    reference distribution plus the bin edges the stream must reuse.
    Every bin 0..bins-1 is materialized per group (baseline-empty bins
    at the ``eps`` clamp) so no stream-side bin can silently miss its
    reference proportion — the asymmetric-drift case PSI exists for."""
    gcols = list(group_cols)
    stats = baseline.groupBy(*gcols).agg(
        F.min(value_col).alias("__lo"),
        F.max(value_col).alias("__hi"),
        F.count(F.lit(1)).alias("n_base"),
    )
    counts = (
        baseline.join(F.broadcast(stats), gcols)
        .select(*gcols, _bin_idx(value_col, bins).alias("__bin"))
        .groupBy(*gcols, "__bin")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    all_bins = stats.select(
        *gcols, "__lo", "__hi", "n_base",
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("__bin"),
    )
    return all_bins.join(counts, gcols + ["__bin"], "left").select(
        *gcols,
        "__bin",
        "__lo",
        "__hi",
        "n_base",
        F.greatest(
            F.coalesce(F.col("__n"), F.lit(0)) / F.col("n_base"), F.lit(eps)
        ).alias("p_base"),
    )


def windowed_bin_counts(
    events: DataFrame,
    baseline_hist: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    bins: int = 10,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """(window_start, window_end, group..., __bin, n_bin): the drift
    cells — one stream-safe windowed aggregation after a broadcast
    bucketing join. Sinkable like the sketch cells; groups absent from
    the baseline are dropped (no reference to drift against)."""
    gcols = list(group_cols)
    edges = baseline_hist.select(*gcols, "__lo", "__hi").distinct()
    return (
        events.withWatermark(ts_col, watermark)
        .join(F.broadcast(edges), gcols)
        .select(ts_col, *gcols, _bin_idx(value_col, bins).alias("__bin"))
        .groupBy(F.window(ts_col, window).alias("w"), *gcols, "__bin")
        .agg(F.count(F.lit(1)).alias("n_bin"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *gcols,
            "__bin",
            "n_bin",
        )
    )


def psi_from_cells(
    cells: DataFrame,
    baseline_hist: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    eps: float = 1e-6,
) -> DataFrame:
    """Reduce drift cells to (window_start, window_end, group...,
    n_cur, psi) — batch/read-side (``foreachBatch`` or a read of the
    sunk cells). The full baseline bin set is restored per observed
    (window, group) before folding, so windows that never saw a
    baseline bin still pay that bin's divergence term and the result
    equals the batch ``psi_drift`` statistic exactly."""
    gcols = list(group_cols)
    wcols = ["window_start", "window_end"]
    windows = cells.select(*wcols, *gcols).distinct()
    full = windows.join(
        F.broadcast(baseline_hist.select(*gcols, "__bin", "p_base")), gcols
    )
    # `full` descends from `cells`, so a bare name-list join is a
    # self-join with conflicting attribute ids; re-aliasing the cells
    # side to fresh names forces new expression ids.
    keys = wcols + gcols + ["__bin"]
    ren = cells.select(
        *[F.col(k).alias(f"__c_{k}") for k in keys],
        F.col("n_bin").alias("__c_n"),
    )
    per_bin = (
        full.join(
            ren, [F.col(k) == F.col(f"__c_{k}") for k in keys], "left"
        )
        .select(
            *keys,
            "p_base",
            F.coalesce(F.col("__c_n"), F.lit(0)).alias("n_bin"),
        )
    )
    tkeys = wcols + gcols
    totals = per_bin.groupBy(*tkeys).agg(F.sum("n_bin").alias("n_cur")).select(
        *[F.col(k).alias(f"__t_{k}") for k in tkeys], "n_cur"
    )
    j = per_bin.join(
        totals, [F.col(k) == F.col(f"__t_{k}") for k in tkeys]
    ).drop(*[f"__t_{k}" for k in tkeys])
    pb = F.greatest(F.col("n_bin") / F.col("n_cur"), F.lit(eps))
    term = (F.col("p_base") - pb) * F.log(F.col("p_base") / pb)
    return j.groupBy(*wcols, *gcols, "n_cur").agg(
        F.round(F.sum(term), 6).alias("psi")
    )
