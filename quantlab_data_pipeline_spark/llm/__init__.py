from .dedup import (
    decontaminate,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from .similarity import (
    brute_force_topk,
    cosine,
    dot,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
    train_centroids,
)
from .text import (
    with_fingerprint,
    with_language_id,
    with_pii_scrub,
    with_quality_score,
    with_text_stats,
)

__all__ = [
    "brute_force_topk",
    "cosine",
    "dot",
    "embedding_near_dup_pairs",
    "decontaminate",
    "exact_dedup",
    "ivf_topk",
    "lsh_candidate_pairs",
    "lsh_topk",
    "train_centroids",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    "with_fingerprint",
    "with_language_id",
    "with_pii_scrub",
    "with_quality_score",
    "with_text_stats",
]
