#!/usr/bin/env python
"""100k-asset scale probe for the perceptual media-dedup family
(VERDICT r6 item 4; the curation-probe pattern).

The registry checks image/audio dedup at 571-5715 assets; this probe
runs the same chains — text -> REAL PNG/WAV codec round trip ->
64-bit fingerprint -> banded Hamming equi-join — on a synthetic corpus
with planted recrawl pairs, and verifies:

1. wall time per stage at increasing n (fingerprinting must scale
   ~linearly; the banded join must stay far from quadratic);
2. recall invariant: every planted pair (ids k, k+1 for k ≡ 0 mod 10,
   identical text -> identical pixels/samples -> hamming 0) surfaces;
3. no pathological candidate blowup: pair count stays within a small
   multiple of the planted count.

Deterministic (md5-derived token soup), so reruns are comparable.

Usage: python scripts/multimodal_scaling_probe.py [n ...]
       (default 25000 50000 100000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from quantlab_data_pipeline_spark.llm.multimodal import (  # noqa: E402
    audio_from_text,
    audio_fingerprint,
    audio_near_dup_pairs,
    image_dhash,
    image_near_dup_pairs,
    media_from_text,
)
from quantlab_data_pipeline_spark.session import get_spark  # noqa: E402


def synthetic_docs(spark, n: int):
    """ids 0..n-1; ids ≡ 1 (mod 10) carry the SAME text as their
    predecessor (a byte-identical recrawl — must fingerprint equal in
    both modalities); everything else is unique hash-derived token
    soup (~40 5-char words)."""
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    seed = F.when(
        F.col("doc_id") % 10 == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.substring(
                F.md5(F.concat(seed.cast("string"), F.lit(":"), i.cast("string"))),
                1, 5,
            ),
        ),
        " ",
    )
    return base.select(
        "doc_id", text.alias("text")
    ).repartition(spark.sparkContext.defaultParallelism)


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [25_000, 50_000, 100_000]
    spark = get_spark(app_name="multimodal-scale-probe")
    report = {"sizes": []}
    for n in sizes:
        docs = synthetic_docs(spark, n)
        planted = n // 10  # one (k, k+1) pair per 10 ids
        row = {"n_assets": n, "planted_pairs": planted}

        media = media_from_text(docs, dims=(32, 32))
        _, row["image_fingerprint_s"] = timed(
            lambda: image_dhash(media).count()
        )
        ipairs, row["image_pairs_s"] = timed(
            lambda: image_near_dup_pairs(media, max_hamming=6)
            .persist().count()
        )
        ip = image_near_dup_pairs(media, max_hamming=6)
        hit = (
            ip.filter(
                (F.col("id_a") % 10 == 0)
                & (F.col("id_b") == F.col("id_a") + 1)
                & (F.col("hamming") == 0)
            ).count()
        )
        row["image_pairs"] = ipairs
        row["image_planted_recall"] = round(hit / planted, 4)

        audio = audio_from_text(docs)
        _, row["audio_fingerprint_s"] = timed(
            lambda: audio_fingerprint(audio).count()
        )
        apairs, row["audio_pairs_s"] = timed(
            lambda: audio_near_dup_pairs(audio, max_hamming=2)
            .count()
        )
        ap = audio_near_dup_pairs(audio, max_hamming=2)
        ahit = (
            ap.filter(
                (F.col("id_a") % 10 == 0)
                & (F.col("id_b") == F.col("id_a") + 1)
                & (F.col("hamming") == 0)
            ).count()
        )
        row["audio_pairs"] = apairs
        row["audio_planted_recall"] = round(ahit / planted, 4)

        assert row["image_planted_recall"] == 1.0, row
        assert row["audio_planted_recall"] == 1.0, row
        assert ipairs < 5 * planted, f"image candidate blowup: {row}"
        assert apairs < 5 * planted, f"audio candidate blowup: {row}"
        report["sizes"].append(row)
        print(json.dumps(row))
    print(json.dumps(report))


if __name__ == "__main__":
    raise SystemExit(main())
