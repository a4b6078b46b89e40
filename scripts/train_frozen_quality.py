#!/usr/bin/env python
"""Train and FREEZE the portable quality classifier (one-off, offline).

Distills the rule-based quality score (median split, same teacher as
``ml_quality_docs``) into a 64-bucket logistic model over portable
md5-hashed token counts, then writes the integer micro-unit weights to
``quantlab_data_pipeline_spark/llm/frozen_quality.py``. The committed
artifact is what ``ml_quality_frozen_docs`` scores with — scoring is
engine-exact (integer sums), so the DuckDB oracle replays it to the
bit, which is the whole point of freezing.

Usage: python scripts/train_frozen_quality.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from quantlab_data_pipeline_spark.llm.classifier import (
        train_frozen_quality_weights,
    )
    from quantlab_data_pipeline_spark.llm.text import with_quality_score
    from quantlab_data_pipeline_spark.session import get_spark
    from quantlab_data_pipeline_spark.sources.testdata import load_table

    spark = get_spark(app_name="train-frozen-quality")
    docs = load_table(spark, sf_dir, "documents")
    scored = with_quality_score(docs)
    med = scored.agg(F.median("quality_score").alias("__med"))
    labeled = scored.crossJoin(F.broadcast(med)).withColumn(
        "label", (F.col("quality_score") >= F.col("__med")).cast("double")
    )
    bias, weights = train_frozen_quality_weights(
        labeled, num_buckets=64, max_iter=50, reg=1e-4
    )

    out = REPO / "quantlab_data_pipeline_spark" / "llm" / "frozen_quality.py"
    wlines = ",\n    ".join(
        ", ".join(str(w) for w in weights[i : i + 8])
        for i in range(0, len(weights), 8)
    )
    out.write_text(
        '"""Frozen quality-classifier artifact (v1).\n'
        "\n"
        "Produced by scripts/train_frozen_quality.py: logistic regression\n"
        "distilled from the rule-based quality score (median-split teacher)\n"
        "over 64 portable md5-hash token buckets, trained on the sf0.01\n"
        "documents corpus. Weights are micro-units (1e-6) — scoring sums\n"
        "INTEGERS, so the frozen model scores bit-identically in Spark,\n"
        "DuckDB, or any engine with md5 (see classifier.score_quality_frozen).\n"
        "Regenerate by re-running the script; bump the version suffix when\n"
        "retraining so downstream keep-decisions stay reproducible.\n"
        '"""\n'
        "\n"
        f"FROZEN_QUALITY_V1_BIAS = {bias}\n"
        "\n"
        "FROZEN_QUALITY_V1_WEIGHTS = [\n"
        f"    {wlines},\n"
        "]\n"
    )
    print(f"wrote {out}: bias={bias}, {len(weights)} weights")


if __name__ == "__main__":
    main()
