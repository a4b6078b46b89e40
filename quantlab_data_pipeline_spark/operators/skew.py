"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in the session factory) handles
sort-merge skew at runtime, but it cannot help when the skewed side
feeds a *broadcast-impossible* join against a medium-sized table, or
when a hot key concentrates in one task of a shuffled hash join. The
classic remedy is salting: explode the small/medium side ``salt_n``
ways and scatter the hot side's rows across the salted copies, so one
hot key spreads over ``salt_n`` tasks.

Use when key-frequency skew is known and heavy (one key >> mean);
measure first — salting multiplies the replicated side by ``salt_n``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_n: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: scatter skewed rows
    into ``salt_n`` buckets with a random-ish deterministic salt
    (xxhash64 of the whole row, not a PRNG — resilient to retries and
    re-computation), replicate ``other`` across every bucket, and join
    on (keys + salt). Result equals the plain join, but the hot key's
    rows land in ``salt_n`` tasks instead of one.

    Only join types that never emit unmatched ``other`` rows are
    allowed: replicating ``other`` ``salt_n`` ways would surface each
    unmatched row ``salt_n`` times under right/full outer.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    how = how.lower()  # DataFrame.join accepts spellings case-insensitively
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} joins; got {how!r} "
            "(right/full outer would duplicate unmatched replicated rows)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_n))
    s = skewed.withColumn("__salt", salt.cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return s.join(o, [*on, "__salt"], how).drop("__salt")
