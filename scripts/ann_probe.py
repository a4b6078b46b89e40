#!/usr/bin/env python
"""ANN scaling probe: exact all-pairs vs banded-LSH near-dup.

Generates a unit-vector corpus with planted near-duplicates (cosine
~0.92-0.96, i.e. the tight regime real embedding dedup runs at), then
measures, at growing corpus sizes:

- wall time of the exact all-pairs plan vs the LSH-candidate plan
- LSH recall of the exact pair set
- candidate ratio: fraction of all O(n^2/2) pairs the LSH path scores

The candidate ratio is the scale story: it is what turns an O(n^2)
dot-product bill into O(n * ratio * n) at 100 TB. Appended (manually)
to BASELINE.md.

Usage: python scripts/ann_probe.py [sizes...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from quantlab_data_pipeline_spark.llm.similarity import (  # noqa: E402
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    plan_signature,
)
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.9
DIM = 64


def make_corpus(spark, n: int, dup_share: float = 0.05, seed: int = 11):
    rng = np.random.RandomState(seed)
    n_dup = int(n * dup_share)
    base = rng.randn(n - n_dup, DIM)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    picks = rng.randint(0, len(base), n_dup)
    # total noise L2 ~0.32-0.45 against unit bases -> cosine ~0.91-0.95
    noise = rng.randn(n_dup, DIM) * (0.38 / DIM**0.5)
    dups = base[picks] + noise
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    X = np.vstack([base, dups]).astype(np.float32)
    rows = [(i, X[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1000, 2000, 4000]
    spark = get_spark(app_name="ann-probe")
    bands, width = plan_signature(THRESHOLD, 0.95)
    print(f"# threshold={THRESHOLD} -> bands={bands} x {width} bits")
    for n in sizes:
        df = make_corpus(spark, n).cache()
        df.count()

        t0 = time.time()
        exact = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(
            df, threshold=THRESHOLD, max_exact_rows=10**9).collect()}
        t_exact = time.time() - t0

        t0 = time.time()
        approx = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs_lsh(
            df, threshold=THRESHOLD, recall=0.95).collect()}
        t_lsh = time.time() - t0

        # candidate ratio: pairs the LSH band join emits vs all pairs
        from pyspark.sql import functions as F
        from quantlab_data_pipeline_spark.llm.similarity import band_signature
        keys = df.select(
            "vec_id", F.explode(band_signature("embedding", bands, width)).alias("b")
        ).select("vec_id", "b.band_idx", "b.band_val")
        ka = keys.select(F.col("vec_id").alias("a"), "band_idx", "band_val")
        kb = keys.select(F.col("vec_id").alias("b"), "band_idx", "band_val")
        n_cand = (
            ka.join(kb, ["band_idx", "band_val"]).filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct().count()
        )
        ratio = n_cand / (n * (n - 1) / 2)
        recall = len(exact & approx) / len(exact) if exact else 1.0
        print(json.dumps({
            "n": n, "exact_sec": round(t_exact, 2), "lsh_sec": round(t_lsh, 2),
            "speedup": round(t_exact / t_lsh, 2),
            "pairs_exact": len(exact), "recall": round(recall, 3),
            "candidate_ratio": round(ratio, 4),
        }))
        df.unpersist()


if __name__ == "__main__":
    main()
