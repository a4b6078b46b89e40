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

from pyspark.sql import DataFrame
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
