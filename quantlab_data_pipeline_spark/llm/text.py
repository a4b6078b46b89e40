"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

All operators are native Catalyst expressions (no Python in the hot
path) — at 100 TB these run inside whole-stage codegen directly over
the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tiny per-language stopword lexicons for the n-gram scoring heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "est", "que"],
}

# BPE-ish token pattern: letter runs, digit runs, or single punctuation.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _tokens(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+"), 0)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, token counts, ratios."""
    t = F.col(text_col)
    words = _tokens(t)
    n_chars = F.length(t)
    n_tokens = F.regexp_count(t, F.lit(TOKEN_PATTERN))
    n_words = F.size(words)
    n_punct = F.regexp_count(t, F.lit("[^A-Za-z0-9\\s]"))
    stop = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
    return df.withColumns(
        {
            "n_chars": n_chars.cast("long"),
            "n_tokens": n_tokens.cast("long"),
            "n_words": n_words.cast("long"),
            "avg_word_len": F.round(
                F.when(
                    n_words > 0,
                    (F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)))
                    / n_words,
                ),
                4,
            ),
            "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
            "stopword_ratio": F.round(
                n_stop / F.greatest(n_words, F.lit(1)), 6
            ),
        }
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1] + keep flag — the filter stage
    of a pretraining-data pipeline. Heuristic: enough words, sane word
    length, not punctuation-soup, some stopwords."""
    out = with_text_stats(df, text_col)
    score = (
        F.when(F.col("n_words") >= 20, F.lit(0.25)).otherwise(
            F.col("n_words") / 80.0
        )
        + F.when(
            (F.col("avg_word_len") >= 2) & (F.col("avg_word_len") <= 12), 0.25
        ).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.1, F.lit(0.25)).otherwise(
            F.greatest(F.lit(0.0), 0.25 - F.col("punct_ratio"))
        )
        + F.when(F.col("stopword_ratio") >= 0.01, F.lit(0.25)).otherwise(0.0)
    )
    return out.withColumn("quality_score", F.round(score, 6)).withColumn(
        "keep", F.col("quality_score") >= 0.5
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language classifier.

    CJK codepoints -> zh; otherwise the language whose stopword lexicon
    hits the most words (ties broken by fixed language order), 'und'
    (undetermined) when nothing hits.
    """
    words = _tokens(F.col(text_col))

    def _score(sw: list[str]) -> Column:
        arr = F.array([F.lit(x) for x in sw])
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

    scores = {lang: _score(sw) for lang, sw in STOPWORDS.items()}
    best = F.greatest(*scores.values())
    argmax = F.lit("und")
    # fixed reverse iteration order => earlier language wins ties
    for lang in reversed(list(STOPWORDS)):
        argmax = F.when(scores[lang] == best, F.lit(lang)).otherwise(argmax)
    cjk = F.regexp_count(F.col(text_col), F.lit("[\\u4e00-\\u9fff]")) > 0
    return df.withColumn(
        "lang_pred",
        F.when(cjk, F.lit("zh")).when(best > 0, argmax).otherwise(F.lit("und")),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (stable content hash for exact dedup / provenance)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


# Patterns restricted to syntax that behaves identically under Java
# regex (Spark) and RE2 (DuckDB oracle): no backrefs, no lookaround.
URL_PATTERN = "https?://[^\\s]+"
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pretraining-intake cleanup: count and mask URLs and email
    addresses. Masking (not deletion) keeps token positions stable for
    downstream span-level tooling."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_urls": F.regexp_count(t, F.lit(URL_PATTERN)).cast("long"),
            "n_emails": F.regexp_count(t, F.lit(EMAIL_PATTERN)).cast("long"),
            "clean_text": F.regexp_replace(
                F.regexp_replace(t, URL_PATTERN, "<URL>"),
                EMAIL_PATTERN,
                "<EMAIL>",
            ),
        }
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, table A1): the
    within-document repetition filters every modern pretraining pipeline
    applies after dedup.

    Adds per-document:

    * ``dup_line_frac`` — fraction of lines that are duplicates of an
      earlier line;
    * ``dup_line_char_frac`` — fraction of characters sitting in those
      duplicate lines;
    * ``dup_para_frac`` / ``dup_para_char_frac`` — same over
      blank-line-separated paragraphs;
    * ``top_2gram_char_frac`` — fraction of characters covered by the
      single most frequent word 2-gram;
    * ``dup_5gram_char_frac`` — fraction of characters in word 5-grams
      that occur more than once.

    All per-row native expressions (arrays + higher-order functions) —
    no shuffle, no Python, no UDF: the whole block evaluates JVM-side
    directly over the scan, so at 100 TB it is a pure map stage. The
    n-gram fractions use the token-character approximation (gram chars /
    total word chars), standard for doc-level scoring. Null text scores
    zero everywhere (no repetition), not null — a null stat would make
    ``gopher_keep`` null and a ``filter`` would silently drop the doc.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))

    # Performance shape: Catalyst inlines column expressions verbatim at
    # every reference — including references INSIDE lambda bodies, where
    # the inlined subtree then re-evaluates once per array element. The
    # textbook formulation (transform over distinct grams, each counting
    # via filter over the gram array) therefore re-tokenizes the
    # document O(distinct · grams) times and a 5k-doc scan ran for
    # minutes. Instead every gram statistic comes out of ONE run-length
    # pass over the SORTED gram array (:func:`_gram_run_stats`): no
    # lambda ever references a column-sized subtree, so even fully
    # inlined the cost is O(n log n) per document per reference.

    def dup_fracs(parts: Column) -> tuple[Column, Column]:
        cleaned = F.filter(
            F.transform(parts, F.trim), lambda p: F.length(p) > 0
        )
        n = F.size(cleaned)
        n_dup = n - F.size(F.array_distinct(cleaned))
        total_chars = F.aggregate(
            cleaned, F.lit(0), lambda a, p: a + F.length(p)
        )
        # chars in duplicate occurrences = total - chars of each distinct
        # part counted once
        distinct_chars = F.aggregate(
            F.array_distinct(cleaned), F.lit(0), lambda a, p: a + F.length(p)
        )
        frac = F.round(n_dup / F.greatest(n, F.lit(1)), 6)
        char_frac = F.round(
            (total_chars - distinct_chars) / F.greatest(total_chars, F.lit(1)), 6
        )
        return frac, char_frac

    line_frac, line_char_frac = dup_fracs(F.split(t, "\n"))
    para_frac, para_char_frac = dup_fracs(F.split(t, "\n\\s*\n"))

    gs2 = _gram_run_stats(t, 2)
    gs5 = _gram_run_stats(t, 5)

    def frac(covered: Column, total: Column) -> Column:
        return F.round(covered / F.greatest(total, F.lit(1)), 6)

    return df.withColumns(
        {
            "dup_line_frac": line_frac,
            "dup_line_char_frac": line_char_frac,
            "dup_para_frac": para_frac,
            "dup_para_char_frac": para_char_frac,
            "top_2gram_char_frac": frac(gs2["best_cov"], gs2["total"]),
            "dup_5gram_char_frac": frac(gs5["dup"], gs5["total"]),
        }
    )


def _gram_run_stats(text_col: Column, k: int) -> Column:
    """One-pass run-length statistics over the sorted word k-grams.

    Returns a struct ``(best_cnt, best_cov, dup, total)``:

    * ``best_cnt`` — occurrence count of the most frequent gram, only
      counting grams occurring more than once (a gram seen once is not
      repetition — without that guard every doc shorter than ~2k words
      would score 1.0 and the filter would reject all short documents);
    * ``best_cov`` — characters covered by that gram (count × length;
      ties at the max count resolve to the larger coverage —
      deterministic, and conservative for a rejection filter);
    * ``dup`` — characters in grams occurring more than once;
    * ``total`` — characters across all gram occurrences.

    Sorting groups equal grams into runs, so one ``aggregate`` pass
    computes every count-dependent statistic with O(1) state and no
    nested array scan — the shape that stays linear after Catalyst
    inlines the expression at each reference site.
    """
    grams = F.array_sort(word_grams(text_col, k))
    # Character accumulators are long: gram chars are ~k x document
    # chars, and a near-2GB document would wrap a 32-bit total silently.
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best_cnt"),
        F.lit(0).cast("long").alias("best_cov"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("total"),
    )

    def close_run(s: Column) -> tuple[Column, Column, Column]:
        """best_cnt/best_cov/dup after closing the in-flight run."""
        runchars = s["run"].cast("long") * F.length(s["prev"])
        closes = s["run"] > 1
        better = closes & (
            (s["run"] > s["best_cnt"])
            | ((s["run"] == s["best_cnt"]) & (runchars > s["best_cov"]))
        )
        return (
            F.when(better, s["run"]).otherwise(s["best_cnt"]),
            F.when(better, runchars).otherwise(s["best_cov"]),
            F.when(closes, s["dup"] + runchars).otherwise(s["dup"]),
        )

    def step(s: Column, g: Column) -> Column:
        same = g == s["prev"]
        bc, bv, dp = close_run(s)
        return F.struct(
            g.alias("prev"),
            F.when(same, s["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, s["best_cnt"]).otherwise(bc).alias("best_cnt"),
            F.when(same, s["best_cov"]).otherwise(bv).alias("best_cov"),
            F.when(same, s["dup"]).otherwise(dp).alias("dup"),
            (s["total"] + F.length(g).cast("long")).alias("total"),
        )

    def finish(s: Column) -> Column:
        bc, bv, dp = close_run(s)
        return F.struct(
            bc.alias("best_cnt"),
            bv.alias("best_cov"),
            dp.alias("dup"),
            s["total"].alias("total"),
        )

    return F.aggregate(grams, init, step, finish)


# Published Gopher rejection thresholds (Rae et al. 2021, table A1).
GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    # 0.15 is the paper's 5-gram value (0.10 is its 10-gram threshold)
    "dup_5gram_char_frac": 0.15,
}


def with_gopher_keep(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply the published Gopher repetition thresholds: adds the stats
    plus a ``gopher_keep`` flag (true = passes every filter)."""
    out = with_repetition_stats(df, text_col)
    keep = F.lit(True)
    for col, thr in GOPHER_THRESHOLDS.items():
        keep = keep & (F.col(col) <= F.lit(thr))
    return out.withColumn("gopher_keep", keep)


def word_grams(
    text_col: str | Column, k: int, short_doc: str = "empty"
) -> Column:
    """All k-word grams of the lowercased word tokens, in order (with
    repeats). The single source of the tokenizer + gram construction —
    :func:`..dedup.word_shingles` (distinct, whole-doc fallback) and
    :func:`top_ngrams` both build on it so decontamination shingles and
    corpus statistics can never drift apart.

    ``short_doc``: what a doc with fewer than ``k`` words yields —
    ``"empty"`` (no grams) or ``"join"`` (its full text as one gram,
    the shingling convention).
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    words = _tokens(col)
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    fallback = (
        F.array() if short_doc == "empty" else F.array(F.array_join(words, " "))
    )
    return F.when(n >= k, grams).otherwise(fallback)


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Global top-k word n-grams with counts — the corpus-statistics
    pass behind tokenizer/vocabulary training and boilerplate
    detection.

    Scale shape: tokenize + explode is map-side; the count aggregates
    with a partial (map-side combine) before one shuffle on the n-gram,
    and the top-k is TakeOrdered on the aggregated (distinct-n-gram-
    sized, not corpus-sized) result. Ties break lexicographically so
    the result is deterministic across engines.
    """
    return (
        df.select(F.explode(word_grams(text_col, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
    )


def hash_uniform(id_col: str | Column, salt: str) -> Column:
    """Uniform [0,1) draw from the first 8 hex chars of
    md5(salt || id) — deterministic across runs, partitionings, AND
    engines (md5 of the same string is universal, unlike xxhash64 /
    rand seeds). The single source of the hash-sampling decision:
    :func:`deterministic_split` and ``mixing.sample_by_domain`` both
    use it, so their reproducibility guarantees cannot drift apart.
    A null id hashes to null — callers must decide what a null draw
    means for them.
    """
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Stable train/val/test assignment by content-independent hash.

    Each row lands in a split according to the first 8 hex chars of
    md5(salt || id) mapped to [0, 1) — deterministic across runs,
    partitionings, AND engines (md5 of the same string is universal,
    unlike xxhash64/rand seeds), so a re-run or a different system
    assigns every document identically: the property that keeps eval
    sets leak-free when the corpus is rebuilt. Pure projection — no
    shuffle, no state.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    # Canonicalize: the [0,1) interval layout follows the SORTED split
    # names, so two equal weight dicts with different insertion order
    # assign identically — the stability promise above must not hinge
    # on dict ordering.
    items = sorted(weights.items())
    total = sum(weights.values())
    u = hash_uniform(id_col, salt)
    # A null id hashes to null; every comparison below is then null and
    # the row must get a null split — NOT silently land in the final
    # (often eval) split.
    expr = F.when(F.col(id_col).isNull(), F.lit(None).cast("string"))
    cum = 0.0
    for name, w in items:
        cum += w / total
        expr = expr.when(u < F.lit(cum), F.lit(name))
    return df.withColumn("split", expr.otherwise(F.lit(items[-1][0])))


def stratified_split(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Exact-count stratified split: every stratum hits its target
    proportion exactly (to floor rounding), not just in expectation.

    :func:`deterministic_split` assigns each row independently, so a
    stratum of n rows gets Binomial(n, p) rows per split — fine
    globally, but a small stratum's val set can be off by ~sqrt(n).
    Here rows are RANKED within their stratum by the same universal
    md5 draw (ties broken by id — a total, engine-independent order)
    and the split boundaries are cut at floor(cum_frac * n): exact
    counts, still deterministic across runs, partitionings, and
    engines — PROVIDED ``id_col`` is non-null: multiple null-id rows
    share one sort key, so their boundary assignment is not
    reproducible (the registry corpus has no null ids).

    Cost: one shuffle on ``strata_col`` (the ranking window). A 100 TB
    corpus with few huge strata should prefer the Bernoulli
    :func:`deterministic_split` (shuffle-free, per-stratum error is
    negligible at that n); this operator is for the many-small-strata
    regime where exactness matters (per-language eval sets, per-domain
    quotas).
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    items = sorted(weights.items())
    total = sum(weights.values())
    # Null draws (null id) sort to the very end deterministically on
    # both engines via the 2.0 sentinel — above every real u in [0,1).
    # Their tie-break is an md5 row fingerprint, so distinct null-id
    # rows order deterministically on any engine/partitioning too
    # (closing the ADVICE r2 caveat).
    u = F.coalesce(hash_uniform(id_col, salt), F.lit(2.0))
    # The row fingerprint (a) only ever evaluates for null-id rows —
    # CASE WHEN short-circuits, so non-null-id rows never pay the
    # to_json and never require every column to be json-serializable —
    # and (b) covers only primitively-typed columns: a MapType's key
    # order or a UDT's rendering is not deterministically serialized,
    # which would break the engine-independent ordering this relies on
    # (ADVICE r6). Caveat: null-id rows identical on every primitive
    # column but differing inside a complex column share a key; such
    # rows are interchangeable for splitting purposes.
    _atomic = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.AtomicType)
    ] or list(df.columns)
    row_fp = F.md5(F.to_json(F.struct(*[F.col(c) for c in _atomic])))
    tie = F.when(F.col(id_col).isNull(), row_fp).otherwise(
        F.col(id_col).cast("string")
    )
    w_rank = Window.partitionBy(strata_col).orderBy(u, tie)
    w_all = Window.partitionBy(strata_col)
    rn = F.row_number().over(w_rank)
    n = F.count(F.lit(1)).over(w_all)
    expr = None
    cum = 0.0
    for name, w in items[:-1]:
        cum += w / total
        cond = rn <= F.floor(F.lit(cum) * n)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    domain_col: str | None = "source",
    lang_col: str | None = "lang",
) -> dict:
    """Corpus-level summary statistics — the numbers a dataset card
    reports (doc/token/char counts, length distribution, domain and
    language composition).

    One full scan, TWO jobs total: a single global aggregate (counts,
    sums, approx length percentiles via the native t-digest
    ``percentile_approx`` — mergeable sketch state, no sort) and one
    map-side-combined groupBy per composition column. No collect of
    anything corpus-sized; at 100 TB this is a linear pass with
    sketch-sized shuffle traffic.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = F.regexp_count(t, F.lit(TOKEN_PATTERN))
    base = df.select(
        F.length(t).alias("__chars"), n_tok.alias("__toks")
    )
    row = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("__chars").alias("n_chars"),
        F.sum("__toks").alias("n_tokens"),
        F.expr(
            "percentile_approx(__toks, array(0.1, 0.5, 0.9, 0.99), 10000)"
        ).alias("tok_pcts"),
        F.round(F.avg("__toks"), 2).alias("avg_tokens"),
        F.max("__toks").alias("max_tokens"),
    ).collect()[0]
    card: dict = {
        "n_docs": row["n_docs"],
        "n_chars": row["n_chars"],
        "n_tokens": row["n_tokens"],
        "avg_tokens": row["avg_tokens"],
        "max_tokens": row["max_tokens"],
        "token_percentiles": {
            p: v
            for p, v in zip(("p10", "p50", "p90", "p99"), row["tok_pcts"] or [])
        },
    }
    for name, col in (("domains", domain_col), ("languages", lang_col)):
        if col and col in df.columns:
            card[name] = {
                r[col]: r["n"]
                for r in df.groupBy(col).agg(F.count("*").alias("n")).collect()
            }
    return card


def filter_funnel(
    df: DataFrame, stages: list[tuple[str, Column]]
) -> DataFrame:
    """Filter-ablation funnel: one row per filter stage, reporting what
    each rule kills in PIPELINE order (``n_killed`` — docs that passed
    every earlier stage and failed this one), what it would flag in
    isolation (``n_flagged_solo`` — the ablation number), and the
    surviving population before/after (``n_in`` / ``n_out``). Every
    curation team builds exactly this report before touching a filter
    threshold: marginal-vs-solo divergence is how overlapping rules
    and dead stages are found.

    ``stages`` is ``[(name, keep_flag_column), ...]`` in pipeline
    order; a NULL flag counts as a fail (a doc a rule can't evaluate
    is filtered, both here and in the oracle restatement).

    Scale shape: ONE pass over ``df`` evaluates all flags inside the
    scan's codegen stage, a single global aggregate reduces to one row
    of per-stage counters (map-side partial agg — the shuffle carries
    one row per task), and the per-stage report rows are unpacked from
    that row with expressions. Nothing is quadratic in stages, nothing
    shuffles doc-sized data twice.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")
    passes = [
        F.coalesce(flag.cast("boolean"), F.lit(False)) for _, flag in stages
    ]
    first_fail = F.coalesce(
        *[F.when(~p, F.lit(i)) for i, p in enumerate(passes)],
        F.lit(-1),
    )
    # sums coalesce to 0: on an EMPTY frame sum() is NULL, and the
    # funnel of an empty corpus is all-zeros, not all-null
    agg = df.agg(
        F.count(F.lit(1)).alias("__n_total"),
        *[
            F.coalesce(
                F.sum(F.when(first_fail == i, 1).otherwise(0)), F.lit(0)
            ).alias(f"__killed_{i}")
            for i in range(len(stages))
        ],
        *[
            F.coalesce(
                F.sum(F.when(~p, 1).otherwise(0)), F.lit(0)
            ).alias(f"__solo_{i}")
            for i, p in enumerate(passes)
        ],
    )
    rows = []
    survivors_in: Column = F.col("__n_total")
    for i, name in enumerate(names):
        killed = F.col(f"__killed_{i}")
        rows.append(
            F.struct(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(name).alias("stage"),
                survivors_in.cast("long").alias("n_in"),
                killed.cast("long").alias("n_killed"),
                F.col(f"__solo_{i}").cast("long").alias("n_flagged_solo"),
                (survivors_in - killed).cast("long").alias("n_out"),
            )
        )
        survivors_in = survivors_in - killed
    return agg.select(
        F.inline(F.array(*rows))
    )


def tokenizer_fertility(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer fertility report — the table a tokenizer
    evaluation produces per (source, language): how many tokens the
    tokenizer spends per document / per word / per byte. Fertility
    (tokens per word) is the standard multilingual-tokenizer metric
    (high fertility on a language means its text costs more context
    window per unit of meaning); bytes-per-token is the compression
    view the scaling-laws literature quotes. Both decide data-mixing
    budgets, so they belong in the corpus pipeline, not a notebook.

    Tokens are the shared BPE-ish ``TOKEN_PATTERN`` count (the same
    expression ``with_text_stats`` exposes per-doc), words the shared
    ``_tokens`` lexer, bytes UTF-8 octets. Null-text docs count in
    ``n_docs`` but contribute zero to every total (they have no
    tokens to spend).

    All ratios are exact integer MICRO-units (floor(1e6 * num / den),
    BIGINT ``div`` — never float division), so the report replays
    bit-for-bit in any engine: tokens_per_doc_micro,
    fertility_micro (tokens per word), bytes_per_token_micro (null
    when the group has zero tokens). Scale shape: per-row codegen
    expressions folded by ONE partial-aggregated groupBy — the
    corpus never shuffles, only the per-group partials do.
    """
    t = F.col(text_col)
    agg = df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(F.regexp_count(t, F.lit(TOKEN_PATTERN))), F.lit(0)
        ).cast("long").alias("total_tokens"),
        F.coalesce(F.sum(F.size(_tokens(t))), F.lit(0))
        .cast("long")
        .alias("total_words"),
        F.coalesce(F.sum(F.octet_length(t)), F.lit(0))
        .cast("long")
        .alias("total_bytes"),
    )
    return agg.select(
        *group_cols,
        "n_docs",
        "total_tokens",
        "total_words",
        "total_bytes",
        F.expr("total_tokens * 1000000 div n_docs").alias(
            "tokens_per_doc_micro"
        ),
        F.expr(
            "CASE WHEN total_words > 0 THEN total_tokens * 1000000 div total_words END"
        ).alias("fertility_micro"),
        F.expr(
            "CASE WHEN total_tokens > 0 THEN total_bytes * 1000000 div total_tokens END"
        ).alias("bytes_per_token_micro"),
    )


# Normalization map: the unicode variants every crawl corpus carries.
# Single-char -> single-char pairs ride one translate() call; the
# multi-char expansions are explicit replaces. Kept deliberately
# small and ASCII-targeted: real NFKC needs ICU (not a regex), so this
# is the documented portable subset, not a unicode-compliance claim.
# Written with explicit codepoint escapes so the
# table is auditable and the DuckDB oracle restates it char-for-char.
_NORM_TRANSLATE_SRC = (
    "\u2018\u2019\u201c\u201d\u2013\u2014\u00a0\u2212"
)  # curly quotes, en/em dash, NBSP, minus sign
_NORM_TRANSLATE_DST = "''\"\"-- -"


def normalize_text(col: Column) -> Column:
    """Portable text-normalization expression: curly quotes/dashes to
    ASCII, ellipsis expanded, C0/C1 control characters stripped,
    whitespace runs collapsed to single spaces, trimmed. Idempotent
    (every output character is a fixed point of every rule — pytest
    pins it), null-preserving, pure codegen. The step that runs
    BEFORE any hash-keyed dedup so that byte-level junk doesn't split
    duplicate groups.
    """
    c = F.translate(col, _NORM_TRANSLATE_SRC, _NORM_TRANSLATE_DST)
    c = F.replace(c, F.lit("…"), F.lit("..."))
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def with_normalized_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
) -> DataFrame:
    """Apply :func:`normalize_text` and report what changed: the
    normalized text, a ``changed`` flag, before/after char counts,
    and ``norm_md5`` — the dedup key downstream stages should use.
    Zero-shuffle projection; every expression codegens.
    """
    norm = normalize_text(F.col(text_col))
    # ``changed`` is a plain inequality, NOT when(isNull, ...): ``!=``
    # already yields NULL for a null input (every normalize_text rule
    # is null-preserving, so out is null iff text is null — identical
    # semantics, pytest-pinned), and the conditional form wrapped the
    # whole normalize chain inside a CASE branch, which blocks
    # whole-stage codegen's common-subexpression elimination — the
    # translate+regex chain then ran once extra per row (guide §1.2:
    # don't compute things twice).
    return (
        df.withColumn(out_col, norm)
        .withColumn("changed", F.col(out_col) != F.col(text_col))
        .withColumn("n_chars_before", F.length(text_col).cast("long"))
        .withColumn("n_chars_after", F.length(out_col).cast("long"))
        .withColumn("norm_md5", F.md5(F.col(out_col)))
    )
