"""Topic clustering for corpus organization: MLlib LDA over term
counts — the discovery/curation step that tells you WHAT is in a crawl
before you decide mixture weights (cluster-balanced sampling, domain
discovery, dataset-card topic summaries).

Scale shape: tokenize + CountVectorizer + online-optimizer LDA are all
distributed MLlib stages (the online optimizer processes mini-batches
of the corpus per iteration — never the whole corpus on the driver);
assignment is a model broadcast + one projection. k, vocabulary size,
and iterations are the cost knobs.

Determinism: fixed ``seed`` makes results reproducible for a given
Spark version and partitioning (verified by test); topic IDENTITY is
still permutation-arbitrary across environments, which is why these
ops ship as library + tests rather than a driver-window oracle row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["topic_model", "assign_topics", "topic_terms"]


def topic_model(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    vocab_size: int = 2048,
    min_df: float = 2.0,
    max_iter: int = 15,
    seed: int = 42,
):
    """Fit (prep_model, lda_model) on the corpus. ``prep_model`` is the
    tokenizer+CountVectorizer pipeline (its vocabulary indexes the LDA
    topic matrix); ``lda_model`` the fitted online-optimizer LDA."""
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer, RegexTokenizer

    prep = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col,
                outputCol="__toks",
                pattern="[^a-z0-9]+",
                minTokenLength=2,
            ),
            CountVectorizer(
                inputCol="__toks",
                outputCol="__tf",
                vocabSize=vocab_size,
                minDF=min_df,
            ),
        ]
    ).fit(docs)
    feat = prep.transform(docs)
    lda = LDA(
        k=k, maxIter=max_iter, seed=seed, featuresCol="__tf", optimizer="online"
    ).fit(feat)
    return prep, lda


def assign_topics(
    docs: DataFrame,
    prep_model,
    lda_model,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, topic, topic_prob): each document's dominant topic and its
    probability — broadcast-scored, one projection over the corpus."""
    from pyspark.ml.functions import vector_to_array

    out = lda_model.transform(prep_model.transform(docs)).withColumn(
        "__td", vector_to_array("topicDistribution")
    )
    return out.select(
        id_col,
        (F.array_position("__td", F.array_max("__td")) - 1)
        .cast("int")
        .alias("topic"),
        F.round(F.array_max("__td"), 6).alias("topic_prob"),
    )


def topic_terms(prep_model, lda_model, top_n: int = 10) -> list[dict]:
    """Driver-side topic card: for each topic, the ``top_n`` highest
    weight vocabulary terms — k x top_n values, dataset-card-sized."""
    vocab = prep_model.stages[-1].vocabulary
    rows = lda_model.describeTopics(top_n).collect()
    return [
        {
            "topic": r["topic"],
            "terms": [vocab[i] for i in r["termIndices"]],
            "weights": [round(float(w), 6) for w in r["termWeights"]],
        }
        for r in rows
    ]
