"""Bloom-filter pre-filtered membership for corpus-vs-corpus dedup.

The 100 TB shape this solves: "drop every document whose key already
exists in a reference set" (an earlier crawl snapshot, a licensed-out
takedown list, another team's corpus). The exact formulation is an
anti-join that shuffles BOTH sides on the key — at billions of rows
per side that is the single largest shuffle in the pipeline, and it
re-runs for every incoming batch. A Bloom filter built once over the
reference keys is a few MB regardless of reference cardinality, rides
to every executor as a broadcast, and answers "definitely absent" for
the overwhelming majority of corpus rows map-side with ZERO shuffle;
only the tiny bloom-positive remainder pays the exact confirm join.
Bloom filters have no false negatives, so the composition equals the
plain anti-join row-for-row — which is exactly what lets a DuckDB
oracle check the fast path against the naive formulation.

Reference parity: the reference engine's dedup surface is a pandas
``drop_duplicates`` (``/root/reference/src/data_pipeline/processors/
data_processors.py``, assets-master dedup); this module is the
beyond-parity scale path for the same "is this key already known?"
question, same family as ``llm/dedup_index.py``'s persisted index.

Hashing is the repo-standard md5-derived portable scheme (double
hashing, Kirsch–Mitzenmacher): h1/h2 are the first/second 8 hex chars
of md5(key) (h2 forced odd so the probe sequence never degenerates),
position_i = (h1 + i*h2) mod num_bits. Every quantity is exact 64-bit
integer arithmetic, so the positions — and therefore bloom verdicts —
replay bit-for-bit in any engine. Bit membership in the packed filter
is equivalent to membership of position_i in the SET of reference
positions, which is how the SQL oracle replays it without bit ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h32(col: Column, offset: int) -> Column:
    """One 32-bit md5 slice as a non-negative bigint (portable)."""
    return F.conv(F.substring(F.md5(col), offset, 8), 16, 10).cast("long")


def bloom_positions(
    col: Column, num_bits: int, num_hashes: int
) -> Column:
    """Array of ``num_hashes`` bit positions for a key (null key -> null).

    Double hashing keeps the md5 evaluation count at ONE per key no
    matter how many probe positions are derived — the per-row cost that
    dominates a 100 TB scan. h1 + i*h2 stays < 2^35 for practical
    num_hashes, far inside bigint.
    """
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    if num_bits < 64:
        raise ValueError(f"num_bits must be >= 64, got {num_bits}")
    h1 = _h32(col, 1)
    h2 = _h32(col, 9).bitwiseOR(F.lit(1))
    return F.when(
        col.isNotNull(),
        F.array(
            *[
                ((h1 + F.lit(i) * h2) % F.lit(num_bits)).alias(f"p{i}")
                for i in range(num_hashes)
            ]
        ),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Build the filter over ``df[key_col]`` as packed 64-bit words.

    Distributed build: explode each key's positions, map to
    (word_idx, bit), and ``bit_or`` the per-word masks — one shuffle
    keyed on word_idx whose output is at most ``num_bits / 64`` rows
    (the filter itself), never reference-sized. Null keys contribute
    nothing (a null is never "known"). Returns
    ``(word_idx bigint, bits bigint)`` for the non-zero words only.
    """
    pos = (
        df.select(F.explode(bloom_positions(F.col(key_col), num_bits, num_hashes)).alias("pos"))
        .select(
            F.floor(F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
    )
    return pos.groupBy("word_idx").agg(F.bit_or("mask").alias("bits"))


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int,
    hit_col: str = "bloom_hit",
) -> DataFrame:
    """Add ``hit_col``: True iff every probe bit is set in the filter.

    The filter is packed into ONE row (a word_idx -> bits map, at most
    ``num_bits / 64`` entries — bounded by construction, independent of
    reference cardinality) and cross-joined broadcast, so the probe is
    a map-side expression over ``df`` with no shuffle of corpus rows.
    Null keys probe to False — a null key is never claimed present.
    """
    packed = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "bits"))
        ).alias("_bloom_words")
    )
    probed = df.crossJoin(F.broadcast(packed))
    pos = bloom_positions(F.col(key_col), num_bits, num_hashes)

    def _bit_set(p: Column) -> Column:
        # bit set <=> ((word >> (p % 64)) & 1) != 0. The Python
        # shiftright wrapper only takes literal counts; call the SQL
        # function, which accepts a column shift amount.
        word = F.coalesce(
            F.element_at(F.col("_bloom_words"), F.floor(p / 64).cast("long")),
            F.lit(0).cast("long"),
        )
        shifted = F.call_function("shiftright", word, (p % 64).cast("int"))
        return shifted.bitwiseAND(F.lit(1).cast("long")) != F.lit(0)

    hit = F.when(
        F.col(key_col).isNull(), F.lit(False)
    ).otherwise(F.forall(pos, _bit_set))
    return probed.withColumn(hit_col, hit).drop("_bloom_words")


def bloom_prefilter_anti_join(
    corpus: DataFrame,
    reference: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    hit_col: str = "bloom_hit",
) -> DataFrame:
    """``corpus`` rows whose key is NOT in ``reference`` — exactly.

    Three stages, equal to ``corpus ANTI JOIN reference`` row-for-row:

    1. build: one pass over reference keys -> packed words (bounded).
    2. probe: map-side bloom over corpus, no shuffle. "No false
       negatives" means every true member is bloom-positive, so the
       bloom-negative rows are KNOWN absent and pass through untouched.
    3. confirm: only the bloom-positive sliver (true members + the
       controlled false-positive fraction) pays the exact anti-join.

    At scale the confirm join's corpus side is ``fp_rate`` of the
    input instead of all of it; the reference side still scans once,
    as it must. Output carries ``hit_col`` so callers can audit the
    pruning ratio. Null-keyed corpus rows are never members (SQL
    anti-join NULL semantics would also keep them — same verdict).

    Honest cost, stated plainly: the negatives/survivors union reads
    the corpus twice in this one-query composition (two cheap scans —
    the SHUFFLE is what the bloom removes). The production shape
    amortizes further: build the filter once over the persisted
    reference (or load the packed words from storage) and run only
    probe + confirm per incoming batch, which is one scan of the batch
    and a small join. Spark's own runtime bloom join
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects the
    same idea per-query; this explicit version exists for the
    persisted, cross-batch reference case it cannot cover.
    """
    bloom = bloom_build(reference, key_col, num_bits, num_hashes)
    probed = bloom_probe(
        corpus, key_col, bloom, num_bits, num_hashes, hit_col=hit_col
    )
    negatives = probed.filter(~F.col(hit_col))
    positives = probed.filter(F.col(hit_col))
    ref_keys = reference.select(F.col(key_col)).distinct()
    survivors = positives.join(ref_keys, on=key_col, how="left_anti")
    return negatives.unionByName(survivors)
