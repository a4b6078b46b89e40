"""Fuzzy (edit-distance) join via deletion-neighborhood blocking.

Entity resolution across data vendors constantly needs "these two name
strings differ by one typo" matching (the string cousin of the CUSIP
interval-overlap resolution in :mod:`.intervals`). The naive form is a
cross join with ``levenshtein`` — O(n²) comparisons, hopeless at scale.
The deletion-neighborhood identity makes it an equi-join:

    two strings are within Levenshtein distance 1 **iff** they share a
    member of their deletion neighborhoods {s} ∪ {s with one char
    deleted}  (substitution: both delete the differing position;
    insert/delete: the shorter string IS a deletion of the longer;
    equal: share s itself).

So: explode each string's |s|+1 variants, equi-join on the variant,
distinct the candidate id pairs, and verify with one ``levenshtein``
call per candidate — the shuffle carries (id, variant) rows, the
quadratic comparison never happens. This is exact (the blocking is an
iff, not a heuristic), and generalizes to distance k by recursing the
deletion step k times (k=1 implemented; candidates grow as |s|^k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_neighborhood", "fuzzy_pairs_distance1"]


def deletion_neighborhood(col: str | Column) -> Column:
    """``array<string>``: the string itself plus every single-character
    deletion of it (|s| + 1 entries; duplicates possible for repeated
    characters — harmless, the candidate set is distinct'd)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(c.substr(F.lit(1), i - 1), c.substr(i + 1, n - i)),
    )
    return F.when(n > 0, F.concat(F.array(c), dels)).otherwise(F.array(c))


def fuzzy_pairs_distance1(
    df: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """All unordered pairs of rows whose ``name_col`` values are within
    Levenshtein distance 1 (including exact duplicates at distance 0).

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``. One exchange
    on the variant key, a distinct over candidate pairs, and a single
    verified ``levenshtein`` per candidate."""
    base = df.select(
        F.col(id_col).alias("__id"), F.col(name_col).alias("__name")
    )
    exploded = base.select(
        "__id",
        "__name",
        F.explode(deletion_neighborhood("__name")).alias("__v"),
    )
    a = exploded.select(
        F.col("__id").alias("id_a"), F.col("__name").alias("name_a"), "__v"
    )
    b = exploded.select(
        F.col("__id").alias("id_b"), F.col("__name").alias("name_b"), "__v"
    )
    return (
        a.join(b, "__v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )
