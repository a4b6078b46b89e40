"""Tests for sequence packing, corpus mixing, Gopher repetition
filters, and SemDeDup semantic dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.llm import (
    chunk_plan,
    mix_corpus,
    pack_documents,
    sample_by_domain,
    semantic_dedup,
    semantic_dedup_pairs,
    temperature_fractions,
    with_gopher_keep,
    with_repetition_stats,
)

# ------------------------------------------------------------- packing


@pytest.fixture(scope="module")
def sized_docs(spark):
    rows = [(i, "w " * (10 + (i * 37) % 90)) for i in range(1, 41)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_plan_offsets_are_global_cumsum(spark, sized_docs):
    out = chunk_plan(sized_docs, max_tokens=128, sep_tokens=1, partitions=4)
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    # offsets must be the exact running sum of (tokens + sep) in id order
    acc = 0
    for r in rows:
        assert r["offset"] == acc, f"doc {r['doc_id']}"
        acc += r["n_tokens"] + 1
        assert r["first_chunk"] == r["offset"] // 128
        assert r["last_chunk"] == (r["offset"] + r["n_tokens"] + 1 - 1) // 128


def test_chunk_plan_partition_count_invariant(spark, sized_docs):
    one = sorted(
        chunk_plan(sized_docs, 64, partitions=1).collect(),
        key=lambda r: r["doc_id"],
    )
    many = sorted(
        chunk_plan(sized_docs, 64, partitions=7).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_chunk_plan_rejects_bad_budget(spark, sized_docs):
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_plan(sized_docs, 0)


def test_pack_documents_respects_budget(spark, sized_docs):
    out = pack_documents(sized_docs, max_tokens=150, partitions=3).collect()
    assert len(out) == 40  # every doc packed exactly once
    assert len({r["doc_id"] for r in out}) == 40
    fills: dict[int, int] = {}
    for r in out:
        assert not r["oversize"]  # all docs fit 150 here
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(v <= 150 for v in fills.values())
    # greedy packing should do far better than one doc per pack
    assert len(fills) < 30


def test_pack_documents_oversize_is_singleton(spark):
    df = spark.createDataFrame(
        [(1, "w " * 500), (2, "w " * 10), (3, "w " * 12)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pack_documents(df, max_tokens=64).collect()}
    assert out[1]["oversize"] and out[1]["pack_pos"] == 0
    # the oversize doc shares its pack with nobody
    assert sum(r["pack_id"] == out[1]["pack_id"] for r in out.values()) == 1
    assert not out[2]["oversize"] and not out[3]["oversize"]


def test_pack_documents_deterministic(spark, sized_docs):
    a = sorted(map(tuple, pack_documents(sized_docs, 150, partitions=3).collect()))
    b = sorted(map(tuple, pack_documents(sized_docs, 150, partitions=3).collect()))
    assert a == b


def test_pack_pos_contiguous_within_pack(spark, sized_docs):
    out = pack_documents(sized_docs, max_tokens=200, partitions=2).collect()
    by_pack: dict[int, list[int]] = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r["pack_pos"])
    for positions in by_pack.values():
        assert sorted(positions) == list(range(len(positions)))


# --------------------------------------------------------- repetition


def test_repetition_stats_duplicate_lines(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta\ngamma delta\nalpha beta\nepsilon"),
            (2, "unique one\nunique two\nunique three"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    # doc 1: 4 lines, 3 distinct -> 1/4 duplicated
    assert out[1]["dup_line_frac"] == pytest.approx(0.25)
    # duplicate chars: total 10+11+10+7=38, distinct 10+11+7=28 -> 10/38
    assert out[1]["dup_line_char_frac"] == pytest.approx(round(10 / 38, 6))
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["dup_line_char_frac"] == 0.0


def test_repetition_stats_duplicate_paragraphs(spark):
    text = "para one here\n\npara two there\n\npara one here"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = with_repetition_stats(df).collect()[0]
    assert r["dup_para_frac"] == pytest.approx(round(1 / 3, 6))
    # line-level: 3 non-empty lines, all... 'para one here' twice -> 1/3
    assert r["dup_line_frac"] == pytest.approx(round(1 / 3, 6))


def test_top_2gram_char_fraction(spark):
    # grams: 'spam ham' x3 (8 chars each), 'ham spam' x2 -> top covers
    # 24 of 40 gram-chars
    df = spark.createDataFrame(
        [(1, "spam ham spam ham spam ham")], "doc_id long, text string"
    )
    r = with_repetition_stats(df).collect()[0]
    assert r["top_2gram_char_frac"] == pytest.approx(0.6)


def test_dup_5gram_char_fraction_and_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e a b c d e a b c d e")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert out[1]["dup_5gram_char_frac"] == 0.0  # < 5 words: no grams
    assert out[1]["top_2gram_char_frac"] == 0.0
    # doc 2: every 5-gram repeats (cyclic) -> fraction 1.0
    assert out[2]["dup_5gram_char_frac"] == pytest.approx(1.0)


def test_gopher_keep_flag(spark):
    clean = (
        "The committee reviewed the proposal in detail and found the "
        "analysis convincing on every point raised by members present."
    )
    spammy = "buy now\n" * 20
    df = spark.createDataFrame(
        [(1, clean), (2, spammy)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["gopher_keep"] for r in with_gopher_keep(df).collect()}
    assert out[1] is True
    assert out[2] is False


# -------------------------------------------------------------- mixing


def test_temperature_fractions_t1_keeps_everything():
    assert temperature_fractions({"a": 100, "b": 900}, 1.0) == {
        "a": 1.0,
        "b": 1.0,
    }


def test_temperature_fractions_flatten():
    # very high T -> uniform target -> keep rate inversely proportional
    f = temperature_fractions({"a": 100, "b": 400}, temperature=1e9)
    assert f["a"] == pytest.approx(1.0, abs=1e-6)
    assert f["b"] == pytest.approx(0.25, abs=1e-6)


def test_temperature_fractions_edge_cases():
    assert temperature_fractions({"a": 0, "b": 10}, 2.0)["a"] == 0.0
    with pytest.raises(ValueError, match="temperature"):
        temperature_fractions({"a": 1}, 0.0)


@pytest.fixture(scope="module")
def domain_docs(spark):
    rows = [(i, "web" if i % 5 else "books") for i in range(1, 2001)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_sample_by_domain_deterministic_and_nested(spark, domain_docs):
    small = sample_by_domain(domain_docs, {"web": 0.3, "books": 0.3})
    big = sample_by_domain(domain_docs, {"web": 0.6, "books": 0.6})
    small_ids = {r["doc_id"] for r in small.collect()}
    again = {r["doc_id"] for r in small.collect()}
    assert small_ids == again  # rerun-stable
    # repartitioning must not change membership (hash, not rand())
    shuffled = {
        r["doc_id"]
        for r in sample_by_domain(
            domain_docs.repartition(13), {"web": 0.3, "books": 0.3}
        ).collect()
    }
    assert small_ids == shuffled
    # nested-sample property: raising the fraction only adds rows
    assert small_ids <= {r["doc_id"] for r in big.collect()}


def test_sample_by_domain_proportions_and_default(spark, domain_docs):
    kept = sample_by_domain(
        domain_docs, {"web": 0.5}, default_fraction=0.0
    ).groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in kept}
    assert "books" not in counts  # unknown domain dropped
    assert counts["web"] == pytest.approx(800, rel=0.12)
    with pytest.raises(ValueError, match="fraction"):
        sample_by_domain(domain_docs, {"web": 1.5})


def test_mix_corpus_temperature_shifts_mixture(spark, domain_docs):
    # natural: web 1600, books 400. T=2 -> shares prop sqrt(sizes) -> 2:1
    mixed = mix_corpus(domain_docs, temperature=2.0)
    counts = {
        r["source"]: r["count"]
        for r in mixed.groupBy("source").count().collect()
    }
    assert counts["books"] == 400  # binding domain keeps 100%
    assert counts["web"] == pytest.approx(800, rel=0.12)


# ------------------------------------------------------------ semdedup


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16))
    rows = []
    vid = 0
    for c in range(4):
        base = centers[c] / np.linalg.norm(centers[c])
        for j in range(6):
            vid += 1
            if j < 3:  # three exact duplicates of the cluster anchor
                v = base
            else:  # distinct members of the same cluster
                v = base + rng.normal(scale=0.4, size=16)
                v = v / np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_pairs_match_bruteforce(spark, clustered_vecs):
    from quantlab_data_pipeline_spark.llm.similarity import dot, unit_vec

    pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            clustered_vecs, threshold=0.999, n_clusters=4
        ).collect()
    }
    # brute-force oracle over all pairs
    a = clustered_vecs.select(
        F.col("vec_id").alias("id_a"), unit_vec("embedding").alias("va")
    )
    b = clustered_vecs.select(
        F.col("vec_id").alias("id_b"), unit_vec("embedding").alias("vb")
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("s", F.round(dot("va", "vb"), 6))
        .filter(F.col("s") >= 0.999)
        .collect()
    }
    # exact duplicates share a cluster by construction, so SemDeDup must
    # recover every brute-force pair here
    assert pairs == exact
    assert len(exact) == 4 * 3  # C(3,2) per cluster's triplet x 4


def test_semantic_dedup_keeps_lowest_id(spark, clustered_vecs):
    kept = semantic_dedup(clustered_vecs, threshold=0.999, n_clusters=4)
    ids = sorted(r["vec_id"] for r in kept.collect())
    # per cluster of 6 (ids 6c+1..6c+6): the duplicate triplet collapses
    # to its lowest id; the three distinct members survive
    expected = sorted(
        6 * c + off for c in range(4) for off in (1, 4, 5, 6)
    )
    assert ids == expected


# ---------------------------------------------------------- line dedup


def test_dedup_lines_keeps_first_occurrence(spark):
    from quantlab_data_pipeline_spark.llm import dedup_lines

    boiler = "subscribe to our newsletter for updates"
    df = spark.createDataFrame(
        [
            (1, f"unique opening line for doc one\n{boiler}\nmore doc one body"),
            (2, f"{boiler}\nsecond document distinct content here"),
            (3, f"third doc says something else\n{boiler}"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df, min_chars=15).collect()}
    assert boiler in out[1]["text"]  # first occurrence survives
    assert boiler not in out[2]["text"]
    assert boiler not in out[3]["text"]
    assert out[1]["n_lines_dropped"] == 0
    assert out[2]["n_lines_dropped"] == 1
    assert out[3]["n_lines_dropped"] == 1
    # surviving lines keep their original order
    assert out[1]["text"].splitlines() == [
        "unique opening line for doc one",
        boiler,
        "more doc one body",
    ]
    assert out[2]["text"] == "second document distinct content here"


def test_dedup_lines_short_lines_untouched(spark):
    from quantlab_data_pipeline_spark.llm import dedup_lines

    df = spark.createDataFrame(
        [(1, "Home\nlong enough line that is not shared"),
         (2, "Home\nanother long enough distinct line here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df).collect()}
    # 'Home' < min_chars: repeated but preserved in both docs
    assert out[1].splitlines()[0] == "Home"
    assert out[2].splitlines()[0] == "Home"


def test_dedup_lines_matches_python_oracle(spark):
    from quantlab_data_pipeline_spark.llm import dedup_lines

    lines_pool = [f"shared boilerplate line number {i}" for i in range(5)] + [
        f"doc specific line {j}" for j in range(40)
    ]
    docs = []
    for d in range(1, 21):
        chosen = [lines_pool[(d * 7 + k * 3) % len(lines_pool)] for k in range(6)]
        docs.append((d, "\n".join(chosen)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # python oracle: first (doc, idx) wins per normalized line
    first: dict[str, tuple[int, int]] = {}
    for d, text in docs:
        for i, ln in enumerate(text.split("\n")):
            key = ln.strip().lower()
            if len(key) >= 15 and key not in first:
                first[key] = (d, i)
    expect = {}
    for d, text in docs:
        keep = []
        dropped = 0
        for i, ln in enumerate(text.split("\n")):
            key = ln.strip().lower()
            if len(key) < 15 or first[key] == (d, i):
                keep.append(ln)
            else:
                dropped += 1
        expect[d] = ("\n".join(keep), dropped)

    got = {
        r["doc_id"]: (r["text"], r["n_lines_dropped"])
        for r in dedup_lines(df, min_chars=15).collect()
    }
    assert got == expect


# ----------------------------------------------------------- plan shape


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sample_by_domain_plan_is_pure_filter(spark, domain_docs):
    plan = _executed_plan(sample_by_domain(domain_docs, {"web": 0.5}))
    assert "Exchange" not in plan  # no shuffle: projection + filter only


def test_chunk_plan_has_no_global_window(spark, sized_docs):
    plan = _executed_plan(chunk_plan(sized_docs, 128, partitions=4))
    # the prefix sum must not serialize through one partition
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan  # mapInPandas cumsum, not a global window


def test_pack_documents_plan_single_shuffle(spark, sized_docs):
    plan = _executed_plan(pack_documents(sized_docs, 150, partitions=4))
    assert plan.count("Exchange hashpartitioning") <= 2  # repartition + groupBy
    assert "FlatMapGroupsInPandas" in plan


def test_semantic_dedup_plan_joins_on_cluster(spark, clustered_vecs):
    plan = _executed_plan(
        semantic_dedup_pairs(clustered_vecs, threshold=0.9, n_clusters=4)
    )
    assert "CartesianProduct" not in plan
    assert "centroid_id" in plan


def test_shuffle_rows_deterministic_and_salted(spark, sized_docs):
    from quantlab_data_pipeline_spark.llm.packing import shuffle_rows

    a = [r["doc_id"] for r in shuffle_rows(sized_docs).collect()]
    b = [r["doc_id"] for r in shuffle_rows(sized_docs.repartition(9)).collect()]
    assert a == b  # partition-layout independent
    assert a != sorted(a)  # actually permuted
    epoch2 = [r["doc_id"] for r in shuffle_rows(sized_docs, salt="e2").collect()]
    assert epoch2 != a  # independent epoch order
    assert sorted(epoch2) == sorted(a)


def test_packing_null_text_is_zero_tokens(spark):
    df = spark.createDataFrame(
        [(1, "some words here"), (2, None)], "doc_id long, text string"
    )
    packed = {r["doc_id"]: r for r in pack_documents(df, 64).collect()}
    assert packed[2]["n_tokens"] == 0 and not packed[2]["oversize"]
    chunks = {r["doc_id"]: r for r in chunk_plan(df, 64).collect()}
    assert chunks[2]["n_tokens"] == 0  # occupies only its separator


def test_temperature_fractions_sharp_t_web_scale():
    # size^(1/T) would overflow float64; log-space keeps ratios finite
    f = temperature_fractions({"web": 10**12, "tiny": 10}, temperature=0.01)
    assert f["web"] == 1.0
    assert f["tiny"] == 0.0  # underflows to zero keep rate, not NaN/crash


def test_dedup_paragraph_unit(spark):
    from quantlab_data_pipeline_spark.llm import dedup_lines

    boiler = "copyright notice all rights reserved worldwide"
    df = spark.createDataFrame(
        [
            (1, f"first doc opening paragraph text\n\n{boiler}"),
            (2, f"{boiler}\n\nsecond doc body paragraph goes here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in dedup_lines(df, unit="paragraph").collect()
    }
    assert boiler in out[1]["text"]
    assert boiler not in out[2]["text"]
    assert out[2]["text"] == "second doc body paragraph goes here"
    assert out[2]["n_lines_dropped"] == 1
    with pytest.raises(ValueError, match="unit"):
        dedup_lines(df, unit="sentence")


# ------------------------------------------------- review-fix guards


def test_mix_corpus_null_domain_rows_drop_cleanly(spark):
    df = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, None), (4, "books")],
        "doc_id long, source string",
    )
    out = mix_corpus(df, temperature=1.0).collect()  # must not TypeError
    assert {r["doc_id"] for r in out} == {1, 2, 4}
    with pytest.raises(ValueError, match="null domain"):
        sample_by_domain(df, {None: 0.5})


def test_sample_by_domain_null_id_kept_when_domain_sampled(spark):
    df = spark.createDataFrame(
        [(1, "web"), (None, "web"), (None, "books")],
        "doc_id long, source string",
    )
    kept = sample_by_domain(df, {"web": 1.0, "books": 0.0}).collect()
    # null-id row in a sampling domain survives; books (fraction 0) drops
    assert sum(r["doc_id"] is None for r in kept) == 1
    assert all(r["source"] == "web" for r in kept)


def test_repetition_stats_null_text_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "regular words that are long enough here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_gopher_keep(df).collect()}
    assert out[1]["gopher_keep"] is True  # not null, not dropped
    assert out[1]["dup_line_frac"] == 0.0
    assert out[1]["dup_para_char_frac"] == 0.0


def test_dedup_lines_null_id_passes_through(spark):
    from quantlab_data_pipeline_spark.llm import dedup_lines

    df = spark.createDataFrame(
        [(1, "a perfectly normal document line"), (None, "another normal line kept")],
        "doc_id long, text string",
    )
    out = dedup_lines(df).collect()
    assert len(out) == 2
    null_row = next(r for r in out if r["doc_id"] is None)
    assert null_row["text"] == "another normal line kept"
    assert null_row["n_lines_dropped"] == 0


def test_pack_documents_adversarial_half_budget_is_linear(spark):
    # every doc just over half the budget: nothing ever fits an open
    # bin. The unbounded first-fit scan was O(n^2) per partition; the
    # capped best-fit list must stay flat. 30k docs in ONE partition
    # would take minutes under the quadratic scan.
    df = (
        spark.range(30_000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("n_tokens", F.lit(40).cast("long"))
    )
    out = pack_documents(
        df, max_tokens=64, token_col="n_tokens", partitions=1
    )
    rows = out.collect()
    assert len(rows) == 30_000
    assert len({r["pack_id"] for r in rows}) == 30_000  # singleton packs
    assert not any(r["oversize"] for r in rows)


def test_gopher_paragraph_char_filter_applies(spark):
    # few but very LONG duplicated paragraphs: count fraction stays
    # under 0.30 while the char fraction exceeds 0.20 -> must reject
    long_para = "x" * 400
    text = "\n\n".join(
        [long_para, long_para] + [f"short unique paragraph {i}" for i in range(5)]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = with_gopher_keep(df).collect()[0]
    assert r["dup_para_frac"] < 0.30
    assert r["dup_para_char_frac"] > 0.20
    assert r["gopher_keep"] is False


def test_full_corpus_pass_end_to_end(spark):
    """The README pipeline, end to end on the sf0.001 documents table:
    exact dedup -> line dedup -> Gopher filter -> decontaminate ->
    mix -> shuffle -> pack. Asserts row accounting at every stage and
    that the final packing covers exactly the surviving docs."""
    from quantlab_data_pipeline_spark.llm import (
        dedup_lines,
        decontaminate,
        exact_dedup,
        mix_corpus,
        pack_documents,
        shuffle_rows,
        with_gopher_keep,
    )
    from quantlab_data_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n0 = docs.count()
    assert n0 > 0

    keepers = exact_dedup(docs).select(
        F.col("keeper_id").alias("doc_id")
    )
    docs1 = docs.join(keepers, "doc_id", "left_semi")
    n1 = docs1.count()
    assert 0 < n1 <= n0

    docs2 = dedup_lines(docs1.select("doc_id", "text", "source"))
    assert docs2.count() == n1  # line dedup never drops documents

    docs3 = with_gopher_keep(docs2).filter("gopher_keep")
    n3 = docs3.count()
    assert 0 < n3 <= n1

    eval_df = docs3.limit(3).select("doc_id", "text")  # worst case: in-corpus
    docs4 = decontaminate(docs3, eval_df).filter("NOT contaminated")
    n4 = docs4.count()
    assert n4 <= n3 - 3  # the planted eval docs must flag themselves

    docs5 = mix_corpus(docs4, temperature=2.0)
    n5 = docs5.count()
    assert 0 < n5 <= n4

    packed = pack_documents(shuffle_rows(docs5), max_tokens=1024)
    assert packed.count() == n5  # every surviving doc packed exactly once
    assert packed.select("doc_id").distinct().count() == n5


def test_repetition_line_stats_match_duckdb(spark):
    """Cross-engine oracle for the line/paragraph repetition stats:
    DuckDB computes the same duplicate-line fractions over the sf0.001
    documents table (same discipline as the registry's oracle gate,
    for an op that lives outside the 50-row driver window)."""
    import duckdb

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    from quantlab_data_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["doc_id"]: (r["dup_line_frac"], r["dup_line_char_frac"])
        for r in with_repetition_stats(docs).collect()
    }
    exp = {
        row[0]: (row[1], row[2])
        for row in duckdb.sql(f"""
            WITH lines AS (
                SELECT doc_id,
                       trim(unnest(string_split(coalesce(text, ''), chr(10)))) AS line
                FROM '{docs_path}'
            ), cleaned AS (
                SELECT doc_id, line FROM lines WHERE length(line) > 0
            ), per_doc AS (
                SELECT doc_id,
                       count(*) AS n,
                       count(DISTINCT line) AS nd,
                       sum(length(line)) AS total_chars
                FROM cleaned GROUP BY doc_id
            ), dist AS (
                SELECT doc_id, sum(length(line)) AS distinct_chars
                FROM (SELECT DISTINCT doc_id, line FROM cleaned) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   round((p.n - p.nd) / greatest(p.n, 1), 6) AS dup_line_frac,
                   round((p.total_chars - i.distinct_chars)
                         / greatest(p.total_chars, 1), 6) AS dup_line_char_frac
            FROM '{docs_path}' d
            LEFT JOIN per_doc p USING (doc_id)
            LEFT JOIN dist i USING (doc_id)
        """).fetchall()
    }
    # docs with no non-empty lines: Spark yields 0.0, DuckDB NULL rows
    exp = {k: (v[0] or 0.0, v[1] or 0.0) for k, v in exp.items()}
    assert got == exp


def test_semantic_dedup_big_cluster_lsh_fallback(spark, clustered_vecs):
    """With max_cluster forced tiny, every cluster routes through the
    banded-LSH fallback — exact duplicates (identical signatures) must
    still all surface, with the same scores as the equi-join path."""
    pairs = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in semantic_dedup_pairs(
            clustered_vecs, threshold=0.999, n_clusters=4, max_cluster=4
        ).collect()
    }
    strict = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in semantic_dedup_pairs(
            clustered_vecs, threshold=0.999, n_clusters=4
        ).collect()
    }
    # identical vectors always collide in sign-LSH: no exact-dup pair lost
    assert set(strict) <= set(pairs)
    for p in strict:
        assert pairs[p] == strict[p]


def test_dataset_card(spark):
    from quantlab_data_pipeline_spark.llm import dataset_card
    from quantlab_data_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    card = dataset_card(docs)
    assert card["n_docs"] == docs.count()
    assert card["n_tokens"] > 0 and card["n_chars"] > 0
    assert card["token_percentiles"]["p50"] <= card["token_percentiles"]["p99"]
    assert card["max_tokens"] >= card["token_percentiles"]["p99"]
    assert sum(card["domains"].values()) == card["n_docs"]
    assert sum(card["languages"].values()) == card["n_docs"]
    # null text counts as an empty doc, not a crash
    withnull = docs.unionByName(
        spark.createDataFrame(
            [(99999, None, "en", "srcX", 0)], docs.schema
        )
    )
    card2 = dataset_card(withnull)
    assert card2["n_docs"] == card["n_docs"] + 1


def test_repeated_spans_finds_boilerplate(spark):
    from quantlab_data_pipeline_spark.llm import repeated_spans

    boiler = "all rights reserved contact us for more information today"
    df = spark.createDataFrame(
        [
            (1, f"first document body text here\n{boiler}"),
            (2, f"{boiler}\nsecond document body entirely different"),
            (3, f"third body words distinct from others\n{boiler}"),
            (4, "no shared content in this one at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    out = repeated_spans(df, k=9, min_count=3).collect()
    spans = {r["span"]: r for r in out}
    assert boiler in spans
    assert spans[boiler]["n_docs"] == 3
    assert spans[boiler]["example_id"] == 1
    # nothing from the unshared doc
    assert all("whatsoever" not in s for s in spans)


def test_remove_repeated_spans_scrubs_boilerplate(spark):
    """The removal half of exact-substring dedup: frequent spans are cut
    from every carrier, pass-through docs and empty docs are untouched,
    and the rebuilt text matches a python recomputation exactly."""
    import re

    from quantlab_data_pipeline_spark.llm import remove_repeated_spans

    boiler = "subscribe to our newsletter for daily updates and offers today"
    rows = [
        (0, f"alpha beta gamma {boiler} delta epsilon"),
        (1, f"{boiler} unique one text body here now for sure ok"),
        (2, "totally unrelated content with plenty of distinct words in it"),
        (3, None),
        (4, ""),
        (5, f"prefix words {boiler} and again {boiler} twice"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_repeated_spans(df, k=8, min_count=2).collect()}

    k = 8
    toks = {i: re.findall(r"[a-z0-9]+", (t or "").lower()) for i, t in rows}
    grams: dict[str, set[int]] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            grams.setdefault(" ".join(ts[p : p + k]), set()).add(i)
    freq = {g for g, s in grams.items() if len(s) >= 2}
    for i, ts in toks.items():
        hit = [p for p in range(len(ts) - k + 1) if " ".join(ts[p : p + k]) in freq]
        cov = {q for p in hit for q in range(p, p + k)}
        kept = [ts[j] for j in range(len(ts)) if j not in cov]
        assert out[i]["clean_text"] == " ".join(kept)
        assert out[i]["n_spans_hit"] == len(hit)
        assert out[i]["n_tokens_removed"] == len(ts) - len(kept)
    # the boilerplate really is gone from every carrier
    for i in (0, 1, 5):
        assert "newsletter" not in out[i]["clean_text"]
    # the clean doc passes through with its tokens intact
    assert out[2]["n_tokens_removed"] == 0


def test_remove_repeated_spans_accepts_external_span_list(spark):
    """Spans mined on one corpus (or curated by hand) scrub another —
    the report/removal split is the production shape: mine once, scrub
    many shards."""
    from quantlab_data_pipeline_spark.llm import remove_repeated_spans

    span = "one two three four"
    docs = spark.createDataFrame(
        [(1, f"head {span} tail words"), (2, "nothing to scrub here")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame([(span,)], "span string")
    out = {
        r["doc_id"]: r
        for r in remove_repeated_spans(docs, k=4, spans=spans).collect()
    }
    assert out[1]["clean_text"] == "head tail words"
    assert out[1]["n_tokens_removed"] == 4
    assert out[2]["n_tokens_removed"] == 0


def test_chunk_sentences_matches_python_oracle(spark):
    """UDTF chunker: greedy sentence accumulation matches a direct
    python recomputation; no sentence is ever split, chunks stay within
    budget unless a single sentence exceeds it."""
    import re

    from quantlab_data_pipeline_spark.llm.packing import (
        SENTENCE_SPLIT,
        chunk_sentences,
    )

    texts = {
        1: "First sentence here. Second one follows! Third is a bit longer "
           "than the others? Fourth ends it.",
        2: "x" * 500 + ". Short tail.",
        5: "One. Two. Three. Four. Five. Six. Seven. Eight. Nine. Ten.",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()] + [(3, None), (4, "")],
        "doc_id long, text string",
    )
    budget = 60
    out = chunk_sentences(docs, max_chars=budget).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_sentences"], r["chunk"])
        )

    def oracle(text):
        sents = [s for s in re.split(SENTENCE_SPLIT, text) if s.strip()]
        chunks, buf = [], []
        for s in sents:
            cand = " ".join(buf + [s])
            if buf and len(cand) > budget:
                chunks.append((len(chunks), len(buf), " ".join(buf)))
                buf = [s]
            else:
                buf.append(s)
        if buf:
            chunks.append((len(chunks), len(buf), " ".join(buf)))
        return chunks

    for i, t in texts.items():
        assert sorted(got[i]) == oracle(t), f"doc {i}"
        # no sentence split: rejoining chunks reproduces every sentence
        rejoined = " ".join(c for _, _, c in sorted(got[i]))
        for s in re.split(SENTENCE_SPLIT, t):
            if s.strip():
                assert s in rejoined
        for _, n, c in got[i]:
            assert len(c) <= budget or n == 1
    # null/empty docs emit no chunks (lateral join over an empty yield)
    assert 3 not in got and 4 not in got


# ------------------------------------------------------- token budgets


def _budget_docs(spark):
    rows = [
        (i, "web" if i < 12 else "code", "tok " * (5 * (i % 4 + 1)))
        for i in range(18)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_token_budget_mix_greedy_fill_semantics(spark):
    """Per source: docs sorted by the md5 draw fill the budget greedily;
    the first overflow doc and everything after it drop. Verified
    against a python replay of the exact same rule."""
    import hashlib

    from quantlab_data_pipeline_spark.llm.mixing import token_budget_mix

    docs = _budget_docs(spark)
    budget = 40
    out = {r["doc_id"]: r for r in token_budget_mix(docs, budget).collect()}

    rows = docs.collect()
    draws = {
        r["doc_id"]: int(
            hashlib.md5(f"budget{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        / 2**32
        for r in rows
    }
    toks = {r["doc_id"]: len(r["text"].split()) for r in rows}
    for src in {"web", "code"}:
        ids = sorted(
            (r["doc_id"] for r in rows if r["source"] == src),
            key=lambda i: (draws[i], i),
        )
        cum = 0
        for i in ids:
            cum += toks[i]
            assert out[i]["n_tokens"] == toks[i]
            assert out[i]["cum_tokens"] == cum
            assert out[i]["kept"] == (cum <= budget)


def test_token_budget_mix_dict_budgets_and_missing_group(spark):
    from quantlab_data_pipeline_spark.llm.mixing import token_budget_mix

    docs = _budget_docs(spark)
    out = token_budget_mix(docs, {"web": 10_000}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # web budget is effectively infinite -> everything kept
    assert all(r["kept"] for r in by_src["web"])
    # code is absent from the dict -> budget 0 -> nothing kept
    assert not any(r["kept"] for r in by_src["code"])


def test_token_budget_mix_nested_under_budget_increase(spark):
    """A bigger budget must strictly grow the kept set (the ablation
    property the md5 ordering exists for)."""
    from quantlab_data_pipeline_spark.llm.mixing import token_budget_mix

    docs = _budget_docs(spark)
    small = {
        r["doc_id"] for r in token_budget_mix(docs, 30).collect() if r["kept"]
    }
    big = {
        r["doc_id"] for r in token_budget_mix(docs, 80).collect() if r["kept"]
    }
    assert small <= big
    assert len(big) > len(small)


def test_token_budget_mix_partitioning_invariant(spark):
    from quantlab_data_pipeline_spark.llm.mixing import token_budget_mix

    docs = _budget_docs(spark)
    a = sorted(map(tuple, token_budget_mix(docs, 40).collect()))
    b = sorted(map(tuple, token_budget_mix(docs.repartition(7), 40).collect()))
    assert a == b


def test_token_budget_mix_dict_budgets_non_string_group(spark):
    """ADVICE r8 regression: dict budgets keyed by a NON-STRING group
    column (an int source id) must join — the old hardcoded
    '{group} string' schema made every group fall to budget 0."""
    from quantlab_data_pipeline_spark.llm.mixing import token_budget_mix

    docs = spark.createDataFrame(
        [(1, 7, "a b c"), (2, 7, "d e"), (3, 8, "f g h i")],
        "doc_id long, src_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in token_budget_mix(
            docs, {7: 10_000, 8: 0}, group_col="src_id"
        ).collect()
    }
    assert out[1]["kept"] and out[2]["kept"]  # budget joined, not 0
    assert not out[3]["kept"]  # explicit 0 budget still honored
