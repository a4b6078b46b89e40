"""DSIR importance resampling (`llm/dsir.py`) — python recomputation of
every stage on a tiny corpus, plus the determinism / contract edges."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.llm.dsir import (
    dsir_log_ratio,
    dsir_select,
    hashed_ngram_counts,
)

RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock prices fell sharply in heavy trading"),
    (3, "the the the the the"),
    (4, "zzzz qqqq xxxx"),
    (5, ""),  # no tokens -> unscorable, must be absent
    (6, "a quiet morning with the newspaper and coffee"),
]
TARGET = [
    (100, "the cat and the dog sat together"),
    (101, "a calm morning with coffee and the newspaper"),
]
BUCKETS = 128


def _py_grams(text):
    words = re.findall(r"[a-z0-9]+", text.lower())
    return words + [" ".join(words[i : i + 2]) for i in range(len(words) - 1)]


def _py_bucket(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % BUCKETS


def _py_counts(rows):
    out = {}
    for i, text in rows:
        c = Counter(_py_bucket(g) for g in _py_grams(text))
        if c:
            out[i] = c
    return out


def _py_ratio(tc, rc):
    t_tot = Counter()
    for c in tc.values():
        t_tot.update(c)
    r_tot = Counter()
    for c in rc.values():
        r_tot.update(c)
    tt, tr = sum(t_tot.values()), sum(r_tot.values())
    # DENSE, like dsir_log_ratio: every bucket 0..B-1, unseen buckets
    # carrying the smoothed default (ADVICE r8: sparse ratio silently
    # dropped store-unseen batch grams in dsir_select_stored).
    return {
        b: round(
            (
                math.log((t_tot.get(b, 0) + 1.0) / (tt + BUCKETS))
                - math.log((r_tot.get(b, 0) + 1.0) / (tr + BUCKETS))
            )
            * 1e9
        )
        for b in range(BUCKETS)
    }


def _frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, target


def test_hashed_ngram_counts_match_python(spark):
    raw, _ = _frames(spark)
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_counts(raw, buckets=BUCKETS).collect()
    }
    want = {
        (i, b): n for i, c in _py_counts(RAW).items() for b, n in c.items()
    }
    assert got == want


def test_log_ratio_matches_python(spark):
    raw, target = _frames(spark)
    rc = hashed_ngram_counts(raw, buckets=BUCKETS)
    tc = hashed_ngram_counts(target, buckets=BUCKETS)
    got = {
        r["bucket"]: r["lr_nano"]
        for r in dsir_log_ratio(tc, rc, BUCKETS).collect()
    }
    want = _py_ratio(_py_counts(TARGET), _py_counts(RAW))
    assert got == want


def test_select_scores_and_cut_match_python(spark):
    raw, target = _frames(spark)
    out = {
        r["doc_id"]: r
        for r in dsir_select(
            raw, target, buckets=BUCKETS, frac=0.5, salt="t"
        ).collect()
    }
    rc, tc = _py_counts(RAW), _py_counts(TARGET)
    ratio = _py_ratio(tc, rc)
    # doc 5 has no tokens -> absent
    assert set(out) == {1, 2, 3, 4, 6}
    keys = {}
    for i, c in rc.items():
        logw = round(sum(n * ratio[b] for b, n in c.items()) / 1e9, 6)
        assert out[i]["log_w"] == pytest.approx(logw, abs=0)
        h = int(hashlib.md5(f"t{i}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        keys[i] = round(logw + -math.log(-math.log(u)), 6)
        assert out[i]["sel_key"] == pytest.approx(keys[i], abs=0)
    order = sorted(keys, key=lambda i: (-keys[i], i))
    k = math.ceil(0.5 * len(order))
    for rank, i in enumerate(order, 1):
        assert out[i]["rank"] == rank
        assert out[i]["selected"] == (rank <= k)
    assert sum(r["selected"] for r in out.values()) == k


def test_selection_stable_across_partitionings(spark):
    raw, target = _frames(spark)
    a = dsir_select(raw, target, buckets=BUCKETS, k=2).collect()
    b = dsir_select(
        raw.repartition(7), target.repartition(3), buckets=BUCKETS, k=2
    ).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(a) == key(b)


def test_k_and_frac_contract(spark):
    raw, target = _frames(spark)
    with pytest.raises(ValueError):
        dsir_select(raw, target)
    with pytest.raises(ValueError):
        dsir_select(raw, target, frac=0.5, k=3)
    got = dsir_select(raw, target, buckets=BUCKETS, k=1).filter("selected")
    assert got.count() == 1


def test_target_tilts_selection(spark):
    """The en-like raw docs must out-score the gibberish under an
    en-prose target — the point of the whole method. Compared per
    gram: the paper's weight is an UNNORMALIZED likelihood ratio, so
    a longer doc accumulates a more negative total even when each of
    its grams is more target-like (inherent length bias, documented
    here rather than hidden by test data)."""
    raw, target = _frames(spark)
    out = {r["doc_id"]: r["log_w"] / r["n_grams"] for r in
           dsir_select(raw, target, buckets=BUCKETS, frac=0.5).collect()}
    # doc 1/6 share the target's vocabulary; doc 4 shares nothing.
    assert out[1] > out[4]
    assert out[6] > out[4]


def test_precomputed_counts_equal_default(spark):
    """Passing precomputed (persisted) feature counts — the
    share-across-targets production path — must give byte-identical
    results to the default inline computation."""
    from quantlab_data_pipeline_spark.llm.dsir import (
        dsir_select,
        hashed_ngram_counts,
    )

    raw, target = _frames(spark)
    rc = hashed_ngram_counts(raw, buckets=BUCKETS).persist()
    tc = hashed_ngram_counts(target, buckets=BUCKETS).persist()
    try:
        a = sorted(map(tuple, dsir_select(raw, target, buckets=BUCKETS, k=2).collect()))
        b = sorted(
            map(
                tuple,
                dsir_select(
                    raw, target, buckets=BUCKETS, k=2,
                    raw_counts=rc, target_counts=tc,
                ).collect(),
            )
        )
        assert a == b
    finally:
        rc.unpersist()
        tc.unpersist()


# ------------------------------------------------ persisted count model


def test_dsir_counts_incremental_equals_rebuild(spark, tmp_path):
    """Additivity: build-from-batch0 + update-with-batch1 must equal a
    from-scratch build over both batches, compaction preserves totals,
    and a fresh read sums un-compacted deltas correctly."""
    from quantlab_data_pipeline_spark.llm.dsir import (
        build_dsir_counts,
        compact_dsir_counts,
        load_dsir_counts,
        update_dsir_counts,
    )

    raw, _ = _frames(spark)
    b0 = raw.filter("doc_id <= 3")
    b1 = raw.filter("doc_id > 3")
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_dsir_counts(b0, inc, buckets=BUCKETS)
    update_dsir_counts(b1, inc)
    build_dsir_counts(raw, full, buckets=BUCKETS)

    def totals(p):
        return {
            r["bucket"]: r["cnt"] for r in load_dsir_counts(spark, p).collect()
        }

    assert totals(inc) == totals(full)
    compact_dsir_counts(spark, inc)
    assert totals(inc) == totals(full)
    # compaction merged deltas to one row per bucket
    n_rows = spark.read.parquet(f"{inc}/counts").count()
    assert n_rows == len(totals(full))


def test_dsir_select_stored_equals_inline(spark, tmp_path):
    """Scoring a batch against persisted target/raw models must equal
    dsir_select run inline over the same corpora (same ratio, same
    Gumbel, same cut) when the batch IS the raw corpus."""
    from quantlab_data_pipeline_spark.llm.dsir import (
        build_dsir_counts,
        dsir_select,
        dsir_select_stored,
    )

    raw, target = _frames(spark)
    tp, rp = str(tmp_path / "t"), str(tmp_path / "r")
    build_dsir_counts(target, tp, buckets=BUCKETS)
    build_dsir_counts(raw, rp, buckets=BUCKETS)
    a = sorted(map(tuple, dsir_select(raw, target, buckets=BUCKETS, k=2).collect()))
    b = sorted(map(tuple, dsir_select_stored(raw, tp, rp, k=2).collect()))
    assert a == b


def test_dsir_select_stored_feature_space_pinned(spark, tmp_path):
    from quantlab_data_pipeline_spark.llm.dsir import (
        build_dsir_counts,
        dsir_select_stored,
        update_dsir_counts,
    )

    raw, target = _frames(spark)
    tp, rp = str(tmp_path / "t"), str(tmp_path / "r")
    build_dsir_counts(target, tp, buckets=BUCKETS)
    build_dsir_counts(raw, rp, buckets=64)
    with pytest.raises(ValueError, match="feature spaces differ"):
        dsir_select_stored(raw, tp, rp, k=1)
    # update uses the STORE's pinned space, not a caller guess: folding
    # a batch into the 64-bucket store keeps totals in 64 buckets
    update_dsir_counts(raw.limit(1), rp)
    from quantlab_data_pipeline_spark.llm.dsir import load_dsir_counts

    assert all(
        r["bucket"] < 64 for r in load_dsir_counts(spark, rp).collect()
    )


def test_dsir_select_stored_unfolded_batch_unseen_buckets(spark, tmp_path):
    """ADVICE r8 regression: scoring a batch WITHOUT folding it into the
    raw store first (the documented standalone usage) must not drop
    grams that hash to store-unseen buckets. Every unseen bucket carries
    the smoothed default log-ratio, and a doc whose buckets are ALL
    unseen still scores."""
    from quantlab_data_pipeline_spark.llm.dsir import (
        build_dsir_counts,
        dsir_select_stored,
    )

    raw, target = _frames(spark)
    tp, rp = str(tmp_path / "t"), str(tmp_path / "r")
    build_dsir_counts(target, tp, buckets=BUCKETS)
    build_dsir_counts(raw, rp, buckets=BUCKETS)

    batch_rows = [
        (900, "the cat sat"),  # mixes seen + maybe-unseen bigrams
        (901, "qqqqqq wwwwww eeeeee"),  # likely all-unseen grams
    ]
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dsir_select_stored(batch, tp, rp, k=1).collect()}

    rc, tc = _py_counts(RAW), _py_counts(TARGET)
    ratio = _py_ratio(tc, rc)  # dense: default for unseen buckets
    want = _py_counts(batch_rows)
    assert set(out) == {900, 901}
    for i, c in want.items():
        assert out[i]["n_grams"] == sum(c.values())  # nothing dropped
        logw = round(sum(n * ratio[b] for b, n in c.items()) / 1e9, 6)
        assert out[i]["log_w"] == pytest.approx(logw, abs=0)


def test_dsir_select_stored_batch_counts_equal_default(spark, tmp_path):
    """``batch_counts=`` (the r9-optimization tokenize-once escape
    hatch the intake sink uses) must reproduce the default path
    bit-for-bit."""
    from quantlab_data_pipeline_spark.llm.dsir import (
        build_dsir_counts,
        dsir_select_stored,
    )

    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    build_dsir_counts(target, str(tmp_path / "t"), buckets=BUCKETS)
    build_dsir_counts(raw, str(tmp_path / "r"), buckets=BUCKETS)
    base = dsir_select_stored(
        raw, str(tmp_path / "t"), str(tmp_path / "r"), frac=0.5
    )
    counts = hashed_ngram_counts(raw, buckets=BUCKETS).localCheckpoint()
    got = dsir_select_stored(
        raw,
        str(tmp_path / "t"),
        str(tmp_path / "r"),
        frac=0.5,
        batch_counts=counts,
    )
    a = {r["doc_id"]: r.asDict() for r in base.collect()}
    b = {r["doc_id"]: r.asDict() for r in got.collect()}
    assert a == b


def test_dsir_store_precomputed_counts_equal_default(spark, tmp_path):
    """``precomputed_counts=`` on build/update (the r9-optimization
    tokenize-once escape hatch: one md5-per-gram explode feeds build,
    fold, and scoring) must leave the store bit-identical to the
    recompute path."""
    from quantlab_data_pipeline_spark.llm.dsir import (
        build_dsir_counts,
        load_dsir_counts,
        update_dsir_counts,
    )

    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    b0 = raw.filter("doc_id <= 3")
    b1 = raw.filter("doc_id > 3")
    plain = str(tmp_path / "plain")
    pre = str(tmp_path / "pre")
    build_dsir_counts(b0, plain, buckets=BUCKETS)
    update_dsir_counts(b1, plain)
    c0 = hashed_ngram_counts(b0, buckets=BUCKETS).localCheckpoint()
    c1 = hashed_ngram_counts(b1, buckets=BUCKETS).localCheckpoint()
    build_dsir_counts(None, pre, buckets=BUCKETS, precomputed_counts=c0)
    update_dsir_counts(None, pre, precomputed_counts=c1)

    def totals(p):
        return {
            r["bucket"]: r["cnt"] for r in load_dsir_counts(spark, p).collect()
        }

    assert totals(pre) == totals(plain)
    # meta pinned identically (feature-space contract intact)
    a = spark.read.parquet(f"{plain}/meta").collect()[0].asDict()
    b = spark.read.parquet(f"{pre}/meta").collect()[0].asDict()
    assert a == b
