"""Bucketed range join: point-in-interval matching WITHOUT an equi key.

The interval joins in operators/intervals.py all carry an equi key
(permno, CUSIP) that drives the shuffle, so the range predicate is a
cheap residual filter. When there is NO equi key — IP→geo lookups,
value banding, time-slice enrichment against a large interval table —
Spark plans a raw ``l.join(r, point.between(lo, hi))`` as a
BroadcastNestedLoopJoin (or a cartesian product when neither side fits
in memory): O(|points| × |intervals|), which is exactly the all-pairs
shape this repo bans everywhere else (llm/similarity.py, llm/dedup.py).

``bucketed_range_join`` manufactures the missing equi key, the same
trick commercial engines apply under a range-join hint:

1. pick a ``bucket_width`` on the point axis;
2. explode each interval into every bucket it spans
   (``sequence(floor(lo/w), floor(hi/w))`` — cheap when intervals are
   short relative to ``w``);
3. equi-join points on ``floor(point/w) == bucket`` — ONE hash
   exchange on the bucket id;
4. re-check the exact range as a residual filter.

Each point lives in exactly one bucket and an interval appears at most
once per bucket, so the join emits no duplicate matches — no dedup
pass needed. Cost: |intervals| × (avg_span/w + 1) exploded rows and a
single keyed shuffle, versus the quadratic nested loop. Choose ``w``
near the median interval span: too small explodes the interval side,
too large piles unrelated intervals into each bucket (the residual
filter then does the work — still correct, just less pruning).
Skewed buckets (a hot value range) are AQE's skew-join case, same as
any hash join in this repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width: float) -> Column:
    return F.floor(col.cast("double") / F.lit(float(width))).cast("long")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
    end_inclusive: bool = False,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (``<=`` end when ``end_inclusive``),
    via a bucket equi-join instead of a nested-loop range join.

    ``how`` may be ``inner`` or ``left`` (left keeps pointless points
    with null interval columns). Output: all point columns + all
    interval columns.
    """
    if how not in {"inner", "left"}:
        raise ValueError(f"bucketed_range_join supports inner|left, got {how!r}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    # degenerate intervals (end < start) match nothing; drop them before
    # explode — Spark's sequence() would otherwise count DOWN and tag
    # them into every bucket in between, reversed.
    iv = intervals.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket_width),
                _bucket(F.col(end_col), bucket_width),
            )
        ),
    )
    pt = points.withColumn("__bucket", _bucket(F.col(point_col), bucket_width))
    upper = (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    residual = (F.col(point_col) >= F.col(start_col)) & upper
    joined = pt.join(iv, ["__bucket"], "inner").filter(residual).drop("__bucket")
    if how == "inner":
        return joined
    # left: re-attach unmatched points via a cheap anti join on the
    # matched point set is wrong when point columns aren't unique, so
    # tag rows instead and recover non-matches from the original frame.
    matched = joined
    unmatched = pt.drop("__bucket").join(
        matched.select(*points.columns).distinct(),
        on=list(points.columns),
        how="left_anti",
    )
    for c in intervals.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return matched.unionByName(unmatched)
