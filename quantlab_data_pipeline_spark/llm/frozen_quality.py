"""Frozen quality-classifier artifact (v1).

Produced by scripts/train_frozen_quality.py: logistic regression
distilled from the rule-based quality score (median-split teacher)
over 64 portable md5-hash token buckets, trained on the sf0.01
documents corpus. Weights are micro-units (1e-6) — scoring sums
INTEGERS, so the frozen model scores bit-identically in Spark,
DuckDB, or any engine with md5 (see classifier.score_quality_frozen).
Regenerate by re-running the script; bump the version suffix when
retraining so downstream keep-decisions stay reproducible.
"""

FROZEN_QUALITY_V1_BIAS = -7199656

FROZEN_QUALITY_V1_WEIGHTS = [
    195482, 30891, 0, 0, 0, -86794, 0, 0,
    0, 0, 343021, 0, 766286, -170438, 701120, 0,
    0, 0, 0, -152627, 0, 0, -8614, 486530,
    0, 143883, 0, 82537, 0, 0, 120313, 174028,
    417930, 0, 0, 0, -496038, 0, 0, 656786,
    0, 416559, 0, 0, 0, 1420878, 0, 0,
    594223, 229569, 0, 0, 0, 0, 0, 19062,
    314802, 2062912, 395064, 0, 0, -26371, 0, 0,
]
