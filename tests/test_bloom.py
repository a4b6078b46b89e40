"""Bloom-filter pre-filtered anti-join (`llm/bloom.py`).

The load-bearing properties, each pinned here:
- no false negatives: every reference member is bloom-positive;
- the composed prefilter+confirm equals the plain anti-join exactly;
- the packed words match a bit-for-bit python reference bloom;
- false positives exist at deliberately small filters (so the confirm
  stage is exercised, not vacuous) and stay under the textbook bound;
- null keys are never claimed present and always survive.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.llm.bloom import (
    bloom_build,
    bloom_positions,
    bloom_prefilter_anti_join,
    bloom_probe,
)


def _py_positions(key: str, num_bits: int, num_hashes: int) -> list[int]:
    h = hashlib.md5(key.encode()).hexdigest()
    h1 = int(h[:8], 16)
    h2 = int(h[8:16], 16) | 1
    return [(h1 + i * h2) % num_bits for i in range(num_hashes)]


def _py_words(keys, num_bits, num_hashes):
    words: dict[int, int] = {}
    for k in keys:
        for p in _py_positions(k, num_bits, num_hashes):
            words[p // 64] = words.get(p // 64, 0) | (1 << (p % 64))
    # pack to signed 64-bit like Spark's BIGINT
    return {
        w: b - (1 << 64) if b >= (1 << 63) else b for w, b in words.items()
    }


BITS, K = 4096, 3


@pytest.fixture(scope="module")
def ref_df(spark):
    return spark.createDataFrame(
        [Row(key=f"ref-{i}") for i in range(200)]
    )


def test_positions_match_python_replay(spark):
    rows = (
        spark.createDataFrame([Row(key=f"k{i}") for i in range(50)])
        .select("key", bloom_positions(F.col("key"), BITS, K).alias("pos"))
        .collect()
    )
    for r in rows:
        assert r.pos == _py_positions(r.key, BITS, K)


def test_build_matches_python_reference_bloom(spark, ref_df):
    got = {
        r.word_idx: r.bits
        for r in bloom_build(ref_df, "key", BITS, K).collect()
    }
    want = _py_words([f"ref-{i}" for i in range(200)], BITS, K)
    assert got == want


def test_no_false_negatives(spark, ref_df):
    bloom = bloom_build(ref_df, "key", BITS, K)
    probed = bloom_probe(ref_df, "key", bloom, BITS, K)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_prefilter_equals_plain_anti_join(spark, ref_df):
    corpus = spark.createDataFrame(
        [Row(doc_id=i, key=f"ref-{i % 350}") for i in range(1000)]
        + [Row(doc_id=10_000, key=None)]
    )
    got = sorted(
        r.doc_id
        for r in bloom_prefilter_anti_join(
            corpus, ref_df, "key", BITS, K
        ).collect()
    )
    want = sorted(
        r.doc_id
        for r in corpus.join(
            ref_df.select("key").distinct(), on="key", how="left_anti"
        ).collect()
    )
    assert got == want
    assert 10_000 in got  # null key always survives


def test_false_positives_exist_and_are_bounded(spark, ref_df):
    # 200 keys * 3 hashes in 4096 bits -> fill ~0.136, fp ~ fill^3 ~ 0.25%;
    # probe 4000 known-absent keys: expect >0 and << the 4x-bound slack.
    corpus = spark.createDataFrame(
        [Row(key=f"absent-{i}") for i in range(4000)]
    )
    bloom = bloom_build(ref_df, "key", BITS, K)
    probed = bloom_probe(corpus, "key", bloom, BITS, K)
    n_set = (
        bloom.select(F.sum(F.bit_count("bits")).alias("s")).collect()[0].s
    )
    fill = n_set / BITS
    fp = probed.filter(F.col("bloom_hit")).count() / 4000
    assert fp <= 4 * fill**K
    assert fp > 0  # the confirm stage is doing real work at this size


def test_null_key_probes_false(spark, ref_df):
    bloom = bloom_build(ref_df, "key", BITS, K)
    probed = bloom_probe(
        spark.createDataFrame([Row(key=None)], "key string"),
        "key",
        bloom,
        BITS,
        K,
    )
    assert [r.bloom_hit for r in probed.collect()] == [False]


def test_null_keys_excluded_from_build(spark):
    df = spark.createDataFrame(
        [Row(key="a"), Row(key=None)], "key string"
    )
    got = {
        r.word_idx: r.bits for r in bloom_build(df, "key", BITS, K).collect()
    }
    assert got == _py_words(["a"], BITS, K)


def test_bad_params_raise(spark, ref_df):
    with pytest.raises(ValueError):
        bloom_build(ref_df, "key", num_bits=32)
    with pytest.raises(ValueError):
        bloom_build(ref_df, "key", num_hashes=0)
