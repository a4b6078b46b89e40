"""Multi-dimensional data layout: Z-order (Morton) clustering.

Why this exists at 100 TB: parquet/Iceberg/Delta readers skip files by
per-file min/max column statistics. A sort on one column gives perfect
skipping on that column and none on any other; interleaving the bits of
two (or more) columns into a single Morton key and range-partitioning on
it bounds EVERY dimension within each output file, so predicates on any
clustered column prune most files. This is the same layout pass as
Delta's OPTIMIZE ZORDER BY / Iceberg's sort-order rewrite, expressed as
pure Catalyst expressions:

* one global min/max aggregate per clustered column (a single reduce,
  attached back with a broadcast — no second scan of the fact table),
* per-row bit interleave as a whole-stage-codegen integer expression
  tree (no UDF, no shuffle),
* bucket assignment by taking the top bits of the Z-value — a
  deterministic range split, not ``ntile`` (a global-window ntile would
  serialize the table through one task; the bit prefix is free and
  equally balanced when the scaled dims are near-uniform).

``repartitionByRange("zbucket")`` + write gives the physical layout;
:func:`zorder_stats` returns the per-bucket min/max manifest that
demonstrates (and lets a reader verify) the multi-dimensional bound.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue_column", "with_zorder", "zorder_stats"]


def _scaled(col: str, bits: int) -> Column:
    """Min-max scale ``col`` to [0, 2**bits) using the broadcast global
    stats columns ``__min_<col>`` / ``__max_<col>`` (attached by
    :func:`with_zorder`). A constant column (max == min) scales to 0
    via the nullif/coalesce guard instead of dividing by zero."""
    top = float((1 << bits) - 1)
    mn, mx = F.col(f"__min_{col}"), F.col(f"__max_{col}")
    frac = (F.col(col).cast("double") - mn.cast("double")) / F.nullif(
        mx.cast("double") - mn.cast("double"), F.lit(0.0)
    )
    return F.coalesce(F.floor(frac * F.lit(top)), F.lit(0)).cast("long")


def _interleave(dims: list[Column], bits: int) -> Column:
    """Morton bit-interleave: bit ``i`` of dimension ``d`` lands at
    position ``i * ndims + d`` — a flat OR-tree of shift/mask terms
    that whole-stage codegen compiles to straight-line JVM integer
    ops (no UDF)."""
    n = len(dims)
    terms = [
        F.shiftleft(F.shiftright(dim, i).bitwiseAND(F.lit(1)), i * n + d)
        for i in range(bits)
        for d, dim in enumerate(dims)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zvalue_column(cols: list[str], bits: int = 16) -> Column:
    """Z-value expression over pre-scaled ``long`` columns (each already
    in [0, 2**bits)). Exposed for callers that scale their own dims."""
    return _interleave([F.col(c) for c in cols], bits)


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    buckets: int = 64,
) -> DataFrame:
    """``df`` + ``zvalue`` (Morton key over ``cols``) + ``zbucket``
    (top-bits range split into ``buckets`` groups; ``buckets`` must be
    a power of two so the split is an exact bit prefix).

    The global min/max per clustered column is one aggregate row,
    attached with a broadcast cross join — the fact table is scanned
    once and never shuffled by this transform; only the optional
    ``repartitionByRange("zbucket")`` before the write moves data.
    """
    if buckets & (buckets - 1) or buckets <= 0:
        raise ValueError(f"buckets must be a power of two, got {buckets}")
    k = buckets.bit_length() - 1
    shift = len(cols) * bits - k
    if shift < 0:
        raise ValueError(f"buckets={buckets} exceeds z-space of {len(cols)}x{bits} bits")
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    scaled = df.crossJoin(F.broadcast(stats)).select(
        df["*"], *[_scaled(c, bits).alias(f"__z_{c}") for c in cols]
    )
    z = _interleave([F.col(f"__z_{c}") for c in cols], bits)
    return (
        scaled.withColumn("zvalue", z)
        .withColumn("zbucket", F.shiftright(F.col("zvalue"), shift))
        .drop(*[f"__z_{c}" for c in cols], *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    )


def zorder_stats(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    buckets: int = 64,
) -> DataFrame:
    """Per-bucket file-skipping manifest: (zbucket, n_rows, min/max of
    every clustered column). This is exactly the metadata a reader uses
    to prune — each bucket's [min, max] box is a small cell of the
    2-D domain instead of the full range a single-column sort leaves
    on the secondary column."""
    z = with_zorder(df, cols, bits=bits, buckets=buckets)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return z.groupBy("zbucket").agg(*aggs)
