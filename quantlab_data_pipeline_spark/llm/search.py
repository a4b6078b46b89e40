"""Keyword search over a document corpus: inverted postings + BM25.

The retrieval twin of the embedding ANN family (llm/similarity.py):
where ANN ranks by vector cosine, this ranks by lexical BM25
(Robertson/Sparck Jones; the Okapi formulation used by Lucene and
every search engine since). Spark-first shape:

1. **postings** — explode each document's tokens to (term, doc_id, tf)
   and aggregate: the inverted index as a DataFrame. Built once,
   persistable like the MinHash dedup index (llm/dedup_index.py); at
   100 TB this is the one corpus-sized shuffle, keyed on the term.
2. **document frequencies** — a groupBy(term) count over the postings;
   the per-term idf is derived from it.
3. **scoring** — filter postings to the query's terms (a tiny IN-list
   that Catalyst pushes into the scan/shuffle), join the ≤|query|-row
   idf frame (broadcast), join per-doc lengths, sum the per-term BM25
   contributions per document. Only documents containing at least one
   query term ever leave the postings filter — the corpus itself is
   never re-scanned at query time.

Everything is pure Catalyst expressions (shared tokenizer with
llm/text.py so features cannot drift from the dedup/LM ops), so the
whole train+query path is oracle-checked against a DuckDB CTE
computing the same statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _tokens


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf) inverted postings plus per-doc length
    ``dl`` carried on every row (denormalized so scoring needs no
    second corpus join)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("__w")
    ).withColumn("dl", F.size("__w"))
    return (
        toks.select("doc_id", "dl", F.explode("__w").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Score every document containing ≥1 query term with Okapi BM25:

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``

    Output: (doc_id, n_hit_terms, score). ``postings`` accepts a
    pre-built (persisted) index from :func:`build_postings`; otherwise
    one is derived from ``docs``. N and avgdl are one-row broadcast
    aggregates — no driver collect, same discipline as the quality
    and LM scorers.
    """
    p = postings if postings is not None else build_postings(docs, id_col, text_col)
    stats = p.select("doc_id", "dl").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    terms = [t.lower() for t in query_terms]
    hits = p.filter(F.col("term").isin(terms))
    df_ = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        hits.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        F.round(F.sum("contrib"), 6).alias("score"),
    )


def tfidf_keywords(
    docs: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-``top_k`` keywords per document by tf-idf:

    ``tfidf = (tf / dl) · ln(N / df)``

    Output: (doc_id, rank, term, tfidf), rank 1-based by
    (tfidf desc, term asc) — the term tie-break keeps the cut
    engine-deterministic (tfidf is rounded to 6 before ranking for the
    same reason). Scale shape: the postings build is the one
    corpus-sized shuffle (reusable/persistable across BM25 and this);
    document frequencies shuffle only (term, count) pairs; the ranking
    window partitions by doc_id, so no task ever sorts more than one
    document's distinct terms.
    """
    p = postings if postings is not None else build_postings(docs, id_col, text_col)
    n_docs = p.select("doc_id").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    dfreq = p.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        p.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tf") / F.col("dl")) * F.log(F.col("n_docs") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "rank", "term", "tfidf")
    )


def rrf_fuse(
    ranked_lists: dict[str, DataFrame],
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher):

    ``rrf(d) = Σ_lists 1 / (k_rrf + rank_list(d))``

    ``ranked_lists`` maps a list name to a frame carrying (``id_col``,
    ``rank``) with 1-based integer ranks; each input MUST already be
    top-k bounded (the contract of every retrieval path here —
    TakeOrderedAndProject caps, per-query rank_topk windows), so the
    union the fusion aggregates is at most ``n_lists · k`` rows and
    never corpus-sized. Output: (id, rrf_score, n_lists, plus one
    ``<name>_rank`` column per input, null where the list missed the
    document)."""
    names = sorted(ranked_lists)
    tagged = None
    for name in names:
        part = ranked_lists[name].select(
            F.col(id_col).alias("__id"),
            F.lit(name).alias("__list"),
            F.col("rank").cast("int").alias("__rank"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    per_list = [
        F.max(F.when(F.col("__list") == n, F.col("__rank"))).alias(f"{n}_rank")
        for n in names
    ]
    return (
        tagged.groupBy("__id")
        .agg(
            F.round(F.sum(1.0 / (F.lit(float(k_rrf)) + F.col("__rank"))), 6).alias(
                "rrf_score"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            *per_list,
        )
        .withColumnRenamed("__id", id_col)
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vecs: DataFrame,
    k: int = 20,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    postings: DataFrame | None = None,
) -> DataFrame:
    """RAG-style hybrid retrieval: BM25 lexical top-k fused with
    embedding-cosine dense top-k by reciprocal-rank fusion.

    ``query_vecs`` is a (small) frame of query vectors with the
    embedding schema; it is broadcast against the corpus by the exact
    cosine scorer, so the dense side is one corpus scan with zero
    corpus shuffle. The lexical side touches only the query terms'
    postings. Both top-k cuts are TakeOrderedAndProject /
    per-query-window shapes — no global sort at any scale. Assumes one
    query (``query_vecs`` is a single vector paired with one term
    list); rank lists are keyed on the shared document id
    (``vec_id == doc_id`` in this corpus).
    """
    from .similarity import brute_force_topk

    lex = bm25_search(
        docs, query_terms, id_col=id_col, text_col=text_col, postings=postings
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # heaps, no global sort); the rank window then runs over <= k rows.
    lex_top = lex.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex_ranked = lex_top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "rank"
    )
    dense_ranked = brute_force_topk(
        query_vecs, embeddings, id_col=vec_id_col, vec_col=vec_col, k=k
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse(
        {"bm25": lex_ranked, "dense": dense_ranked}, k_rrf=k_rrf, id_col="doc_id"
    )
