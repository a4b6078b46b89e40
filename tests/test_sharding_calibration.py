"""Unit tests for the round-9 second-wave operators: size-balanced
output sharding + manifests + compaction planning, cross-source
duplicate attribution, tokenizer fertility, text normalization,
DPO preference-pair assembly, and classifier calibration."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.llm.classifier import (
    calibration_report,
    score_quality_frozen,
)
from quantlab_data_pipeline_spark.llm.dedup import dup_attribution
from quantlab_data_pipeline_spark.llm.frozen_quality import (
    FROZEN_QUALITY_V1_BIAS,
    FROZEN_QUALITY_V1_WEIGHTS,
)
from quantlab_data_pipeline_spark.llm.sft import dpo_pairs
from quantlab_data_pipeline_spark.llm.sharding import (
    compaction_plan,
    content_fingerprint,
    shard_assign,
    shard_manifest,
)
from quantlab_data_pipeline_spark.llm.text import (
    normalize_text,
    tokenizer_fertility,
    with_normalized_text,
    with_quality_score,
)


# ---------------------------------------------------------------- sharding
def _docs(spark, n=200, seed_bytes=37):
    rows = [(i, ((i * seed_bytes) % 900) + 100) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, bytes long")


def test_shard_assign_is_contiguous_first_fit(spark):
    df = _docs(spark)
    out = shard_assign(
        df, "bytes", 4096, [F.col("doc_id").asc()]
    ).orderBy("doc_id")
    rows = out.collect()
    # replay the prefix-sum binning in python
    cum = 0
    for r in rows:
        assert r.shard_id == cum // 4096
        cum += r.bytes
    # bound: every shard's payload < target + max single row
    per = (
        out.groupBy("shard_id").agg(F.sum("bytes").alias("b")).collect()
    )
    max_row = max(r.bytes for r in rows)
    assert all(p.b < 4096 + max_row for p in per)


def test_shard_assign_partitioning_invariant(spark):
    df = _docs(spark, n=500)
    a = shard_assign(df, "bytes", 2048, [F.col("doc_id").asc()])
    b = shard_assign(
        df.repartition(7), "bytes", 2048, [F.col("doc_id").asc()]
    )
    assert sorted((r.doc_id, r.shard_id) for r in a.collect()) == sorted(
        (r.doc_id, r.shard_id) for r in b.collect()
    )


def test_shard_manifest_fingerprint_order_insensitive(spark):
    df = _docs(spark, n=60)
    assigned = shard_assign(df, "bytes", 4096, [F.col("doc_id").asc()])
    fp = content_fingerprint(F.col("doc_id").cast("string"))
    m1 = shard_manifest(assigned, fp, "bytes").orderBy("shard_id")
    # same rows, shuffled input order/partitioning -> identical manifest
    m2 = shard_manifest(
        assigned.orderBy(F.rand(7)).repartition(5), fp, "bytes"
    ).orderBy("shard_id")
    assert m1.collect() == m2.collect()
    # the fingerprint term replays: xor of 60-bit md5 slices
    r0 = m1.first()
    ids = [
        r.doc_id
        for r in assigned.filter(F.col("shard_id") == r0.shard_id).collect()
    ]
    expect = 0
    for i in ids:
        expect ^= int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    assert r0.content_fp == expect
    # a doubled row flips the fingerprint (duplicates don't hide)
    dup = shard_manifest(
        assigned.unionByName(assigned.limit(1)), fp, "bytes"
    ).orderBy("shard_id")
    assert dup.first().content_fp != r0.content_fp


def test_compaction_plan_moves_only_small_shards(spark):
    man = spark.createDataFrame(
        [(0, 100), (1, 5000), (2, 200), (3, 300), (4, 4800), (5, 250)],
        "shard_id long, total_bytes long",
    )
    plan = compaction_plan(man, target_bytes=600, min_bytes=400)
    rows = {r.shard_id: r for r in plan.collect()}
    assert rows[1].action == "keep" and rows[1].merge_group is None
    assert rows[4].action == "keep"
    small = [rows[i] for i in (0, 2, 3, 5)]
    assert all(r.action == "merge" for r in small)
    # prefix-sum binning over shard order: 100,200,300 fill group 0
    # (cum-before 0,100,300 all < 600), shard 5 starts at 600 -> group 1
    assert [rows[i].merge_group for i in (0, 2, 3, 5)] == [0, 0, 0, 1]
    with pytest.raises(ValueError):
        compaction_plan(man, target_bytes=100, min_bytes=200)


# ---------------------------------------------------- duplicate attribution
def test_dup_attribution_counts_cross_source_pairs(spark):
    rows = [
        (1, "aaa", "s1"),
        (2, "aaa", "s1"),
        (3, "aaa", "s2"),
        (4, "aaa", "s2"),
        (5, "aaa", "s2"),  # group aaa: 2 in s1, 3 in s2 -> 6 pairs
        (6, "bbb", "s1"),
        (7, "bbb", "s3"),  # group bbb: s1 x s3 -> 1 pair
        (8, "ccc", "s1"),  # unique, no pair
        (9, "ddd", "s2"),
        (10, "ddd", "s2"),  # same-source dup only: not in the matrix
        (11, None, "s1"),
        (12, "eee", None),  # null text / null source drop out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r.source_a, r.source_b): r
        for r in dup_attribution(df).collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3")}
    r = out[("s1", "s2")]
    assert (r.n_groups, r.n_pairs, r.n_docs_a, r.n_docs_b) == (1, 6, 2, 3)
    r = out[("s1", "s3")]
    assert (r.n_groups, r.n_pairs, r.n_docs_a, r.n_docs_b) == (1, 1, 1, 1)


# ------------------------------------------------------- tokenizer fertility
def test_tokenizer_fertility_exact_micro_units(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world, twice!", "en"),
            (2, "hello again", "en"),
            (3, None, "en"),  # null text: counted doc, zero totals
            (4, "uno", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r for r in tokenizer_fertility(df, ["lang"]).collect()}
    en = out["en"]
    # tokens: hello|world|,|twice|! = 5 ; hello|again = 2
    assert en.n_docs == 3 and en.total_tokens == 7
    assert en.total_words == 5  # punctuation is not a word
    assert en.total_bytes == len(b"hello world, twice!") + len(b"hello again")
    assert en.tokens_per_doc_micro == 7 * 1_000_000 // 3
    assert en.fertility_micro == 7 * 1_000_000 // 5
    assert en.bytes_per_token_micro == en.total_bytes * 1_000_000 // 7
    es = out["es"]
    assert (es.total_tokens, es.fertility_micro) == (1, 1_000_000)


def test_tokenizer_fertility_zero_token_group_is_null(spark):
    df = spark.createDataFrame(
        [(1, None, "xx"), (2, "", "xx")], "doc_id long, text string, lang string"
    )
    r = tokenizer_fertility(df, ["lang"]).first()
    assert r.total_tokens == 0
    assert r.fertility_micro is None and r.bytes_per_token_micro is None


# ---------------------------------------------------------- normalization
def test_normalize_text_rules_and_idempotence(spark):
    dirty = (
        "‘a’ “b”  c–d — e…"
        " f −g\th\x07i\r\n j  "
    )
    df = spark.createDataFrame([(1, dirty), (2, None), (3, "clean text")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in with_normalized_text(df).collect()}
    assert out[1].norm_text == "'a' \"b\" c-d - e... f -g hi j"
    assert out[1].changed is True
    assert out[3].changed is False and out[3].norm_text == "clean text"
    assert out[2].norm_text is None and out[2].changed is None
    # idempotence: normalizing the normalized text is the identity
    twice = (
        df.select(normalize_text(normalize_text(F.col("text"))).alias("t2"),
                  normalize_text(F.col("text")).alias("t1"))
        .filter(~F.col("t1").eqNullSafe(F.col("t2")))
        .count()
    )
    assert twice == 0
    md5 = hashlib.md5(out[1].norm_text.encode()).hexdigest()
    assert out[1].norm_md5 == md5


# ------------------------------------------------------------- DPO pairs
def test_dpo_pairs_picks_extremes_with_deterministic_ties(spark):
    rows = [
        # group A: clear best (id 3) and worst (id 1)
        ("A", 1, 1.004, "w"),
        ("A", 2, 5.0, "m"),
        ("A", 3, 9.996, "b"),
        # group B: tie on max -> chosen is the LOWEST id among ties;
        # tie on min -> rejected is the HIGHEST id among ties
        ("B", 4, 7.0, "t1"),
        ("B", 5, 7.0, "t2"),
        ("B", 6, 1.0, "u1"),
        ("B", 7, 1.0, "u2"),
        # group C: single event -> no pair
        ("C", 8, 3.0, "solo"),
        # group D: zero margin -> no pair
        ("D", 9, 2.0, "z1"),
        ("D", 10, 2.0, "z2"),
        # group E: null values drop; the remaining single row -> no pair
        ("E", 11, None, "n1"),
        ("E", 12, 4.0, "n2"),
    ]
    df = spark.createDataFrame(rows, "grp string, event_id long, value double, tag string")
    out = {
        r.grp: r
        for r in dpo_pairs(
            df, ["grp"], "value", content=F.col("tag")
        ).collect()
    }
    assert set(out) == {"A", "B"}
    a = out["A"]
    # cents are exact: floor(v*100 + 0.5)
    assert (a.chosen_id, a.rejected_id) == (3, 1)
    assert (a.chosen_cents, a.rejected_cents) == (1000, 100)
    assert a.margin_cents == 900
    b = out["B"]
    assert (b.chosen_id, b.chosen) == (4, "t1")
    assert (b.rejected_id, b.rejected) == (7, "u2")
    assert b.margin_cents == 600


def test_dpo_pairs_min_margin_filters(spark):
    df = spark.createDataFrame(
        [("A", 1, 1.0), ("A", 2, 1.05)], "grp string, event_id long, value double"
    )
    assert dpo_pairs(df, ["grp"], "value").count() == 1
    assert dpo_pairs(df, ["grp"], "value", min_margin=5).count() == 0


# ------------------------------------------------------------ calibration
def test_calibration_report_buckets_and_agreement(spark):
    df = spark.createDataFrame(
        [
            (1, -25_000_000, False, False),  # clamps to -10M -> bucket 0
            (2, -1, False, True),            # bucket 4 (boundary below 0)
            (3, 0, True, True),              # bucket 5
            (4, 1_999_999, True, False),     # bucket 5
            (5, 25_000_000, True, True),     # clamps to +10M -> bucket 10
        ],
        "doc_id long, ml_score_micro long, ml_keep boolean, keep boolean",
    )
    out = {r.bucket: r for r in calibration_report(df).collect()}
    assert set(out) == {0, 4, 5, 10}
    assert out[0].logit_lo_micro == -10_000_000
    assert (out[5].n_docs, out[5].n_student_keep, out[5].n_teacher_keep,
            out[5].n_agree) == (2, 2, 1, 1)
    assert out[4].n_agree == 0
    assert out[10].n_agree == 1
    with pytest.raises(ValueError):
        calibration_report(df, bucket_micro=0)


def test_calibration_on_frozen_model_matches_direct_agg(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = score_quality_frozen(
        with_quality_score(docs),
        FROZEN_QUALITY_V1_BIAS,
        FROZEN_QUALITY_V1_WEIGHTS,
    )
    rep = calibration_report(scored)
    # column-sum identity: bucket totals add back to the corpus totals
    tot = rep.agg(
        F.sum("n_docs"), F.sum("n_student_keep"), F.sum("n_teacher_keep")
    ).first()
    base = scored.agg(
        F.count("*"),
        F.sum(F.when(F.col("ml_keep"), 1).otherwise(0)),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)),
    ).first()
    assert tuple(tot) == tuple(base)


# -------------------------------------------------------- embedding drift
def test_embedding_drift_report_exact_terms(spark):
    from quantlab_data_pipeline_spark.llm.similarity import (
        embedding_drift_report,
    )

    base = spark.createDataFrame(
        [(0, [0.5, 1.0]), (0, [1.5, 1.0]), (1, [-0.3, 0.2])],
        "label int, embedding array<float>",
    )
    cand = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [9.9, 9.9])],
        "label int, embedding array<float>",
    )
    out = {r.label: r for r in embedding_drift_report(base, cand).collect()}
    # label 1 / 2 are one-sided: not reported
    assert set(out) == {0}
    r = out[0]
    assert (r.n_base, r.n_cand) == (2, 1)
    # dim0: |2000000*1 - 1000000*2| = 0 ; dim1: |2000000*1 - 0*2| = 2000000
    assert r.l1_cross == 2_000_000
    assert (r.top_dim, r.top_dim_term) == (1, 2_000_000)


def test_embedding_drift_tie_breaks_to_min_dim(spark):
    from quantlab_data_pipeline_spark.llm.similarity import (
        embedding_drift_report,
    )

    base = spark.createDataFrame(
        [(0, [1.0, 1.0])], "label int, embedding array<float>"
    )
    cand = spark.createDataFrame(
        [(0, [0.0, 0.0])], "label int, embedding array<float>"
    )
    r = embedding_drift_report(base, cand).first()
    # both dims drift identically -> deterministic min-dim winner
    assert (r.top_dim, r.l1_cross) == (0, 2_000_000)


def test_embedding_drift_negative_quantization(spark):
    from quantlab_data_pipeline_spark.llm.similarity import (
        embedding_drift_report,
    )

    base = spark.createDataFrame(
        [(0, [-0.3])], "label int, embedding array<float>"
    )
    cand = spark.createDataFrame(
        [(0, [0.3])], "label int, embedding array<float>"
    )
    r = embedding_drift_report(base, cand).first()
    # floor(-0.3*1e6) = -300000 (float32 of 0.3 is slightly above .3,
    # so the exact quantized values are -300000 and 300000 with the
    # float32->double widening being value-preserving)
    assert r.l1_cross == abs(-300000 - 300000) or r.l1_cross == 600001
