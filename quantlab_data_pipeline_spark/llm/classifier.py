"""Learned document-quality classifier (distillation pattern).

Production pretraining pipelines (CCNet, DCLM, FineWeb-Edu) filter with a
*trained* classifier — a cheap linear model over bag-of-words features,
fasttext-style — rather than hand-tuned heuristics alone. The heuristics
bootstrap the labels (distillation): label a sample with the rule-based
filter (:func:`..text.with_quality_score` / ``with_gopher_keep``), fit a
logistic regression on hashed token features, then score the full corpus
with the model. The learned model generalizes past the exact rule
thresholds and its score is a smooth ranking signal for quality-ordered
curricula, not just a boolean gate.

Scale shape:

- **Training** runs on a hash-sampled slice (``hash_uniform`` — rerun- and
  partition-stable); MLlib's LogisticRegression is itself distributed
  (treeAggregate gradient), so even the sample can be millions of rows.
- **Featurization** is HashingTF (feature hashing): no vocabulary build,
  no dictionary broadcast, fixed-width vectors — the only corpus pass is
  the scoring pass itself.
- **Scoring** is a JVM-side ``PipelineModel.transform`` — tokenizer,
  hashing, and the dot product all execute in the executors with zero
  Python in the plan (verified by test: no BatchEvalPython/ArrowEval in
  the scored plan).

The reference pipeline has no analogue (its quality control is schema
validation only); this is part of the beyond-parity training-data
surface. No proprietary models or weights involved — labels come from
the published Gopher/C4-style rules implemented in :mod:`.text`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"  # mirrors text._tokens: lowercase [a-z0-9]+ runs


def _pipeline(text_col: str, num_features: int, max_iter: float, reg: float):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol="__words",
        pattern=TOKEN_SPLIT,
        gaps=True,
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="__words", outputCol="features", numFeatures=num_features
    )
    lr = LogisticRegression(
        maxIter=int(max_iter),
        regParam=reg,
        labelCol="label",
        featuresCol="features",
        probabilityCol="__prob",
        rawPredictionCol="__raw",
        predictionCol="__pred",
    )
    return Pipeline(stages=[tok, tf, lr])


def _detach_training_summary(model, model_path: str | None = None):
    """Return ``model`` without its training summary, via a save/load
    roundtrip (``PipelineModel.load`` never attaches one).

    Why: Spark 4's ``LogisticRegressionModel`` keeps the training
    summary — which holds the live ``SparkSession`` — reachable from
    the model object, and the scoring UDF captures the model into task
    closures. ``SparkSession.observationManager`` is a lazy val; the
    moment ANY ``df.observe()`` action initializes it (the ingest
    pipeline's write-count observation does), the session object stops
    being Java-serializable and every closure holding a summary-bearing
    model dies with ``Task not serializable: ObservationManager``. The
    roundtrip costs one tiny model write+read at train time and makes
    the returned model closure-safe regardless of session history.

    ``model_path``: where to persist (kept if given — doubles as model
    persistence for reuse). Defaults to a driver-local temp dir, which
    is correct on local[*]; on a multi-node cluster pass a shared
    filesystem path (executors read the model files during load).
    """
    import shutil
    import tempfile

    from pyspark.ml import PipelineModel

    tmp = model_path or tempfile.mkdtemp(prefix="qc-model-")
    target = f"{tmp}/quality_model"
    model.write().overwrite().save(target)
    reloaded = PipelineModel.load(target)
    if model_path is None:
        shutil.rmtree(tmp, ignore_errors=True)
    return reloaded


def train_quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str | None = None,
    sample_frac: float = 1.0,
    num_features: int = 1 << 18,
    max_iter: int = 30,
    reg: float = 1e-3,
    model_path: str | None = None,
):
    """Fit the quality model. Returns an MLlib ``PipelineModel``.

    ``label_col``: an existing boolean/0-1 teacher column. When ``None``
    the rule-based :func:`..text.with_quality_score` ``keep`` flag labels
    the data (distillation of the heuristic). ``sample_frac`` < 1 trains
    on a deterministic md5-hash slice — the same rows on every rerun and
    any partitioning, unlike ``DataFrame.sample``.
    """
    from .text import hash_uniform, with_quality_score

    d = docs.filter(F.col(text_col).isNotNull())
    if sample_frac < 1.0:
        d = d.filter(hash_uniform("qc-train", d.columns[0]) < sample_frac)
    if label_col is None:
        d = with_quality_score(d, text_col)
        label_col = "keep"
    d = d.withColumn("label", F.col(label_col).cast("double"))
    fitted = _pipeline(text_col, num_features, max_iter, reg).fit(d)
    return _detach_training_summary(fitted, model_path)


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Score a corpus with a trained model: adds ``ml_quality_prob``
    (P(keep), a smooth ranking signal) and ``ml_keep``. Null text scores
    as empty text (tokenizer contract) rather than erroring. The whole
    transform is JVM-side — safe in the hot path of a 100 TB scan."""
    d = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(d)
    return scored.select(
        *docs.columns,
        F.round(vector_to_array("__prob")[1], 6).alias("ml_quality_prob"),
    ).withColumn("ml_keep", F.col("ml_quality_prob") >= threshold)


# ------------------------------------------------- frozen-weight scoring
#
# Production pipelines ship a FROZEN classifier artifact (fasttext .bin,
# DCLM's published weights) and only re-train on a cadence; the scoring
# pass is the 100 TB part. The frozen path here makes that pass fully
# engine-portable AND oracle-checkable: tokens bucket by the md5-based
# portable hash (replayable in DuckDB/any engine), weights are
# micro-unit INTEGERS (exact arithmetic, no float-order sensitivity),
# and the decision boundary is score >= 0 (logit form of prob >= 0.5).


def bucket_expr(tok: Column, num_buckets: int) -> Column:
    """Engine-portable token -> feature bucket: first 8 md5 hex chars as
    a 32-bit unsigned int, mod ``num_buckets`` (same md5 contract as
    :func:`..dedup.portable_hash32`, inlined for use inside lambda)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")
        % num_buckets
    )


def train_frozen_quality_weights(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_buckets: int = 64,
    max_iter: int = 50,
    reg: float = 1e-4,
) -> tuple[int, list[int]]:
    """Fit logistic regression over portable-hash bucket COUNTS and
    return ``(bias_micro, weights_micro)`` — coefficients in micro-units
    (1e-6), the freezing step run offline (scripts/train_frozen_quality
    .py) to produce a committed artifact like FROZEN_QUALITY_V1.

    Features are per-doc counts of tokens hashed into ``num_buckets``
    buckets with the md5 portable hash — NOT MLlib's HashingTF
    (murmur3, JVM-private), so a frozen model scores identically in any
    engine. Training itself is MLlib (deterministic for fixed data and
    params); only the exported integers are the artifact."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    toks = F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+', 0)")
    buckets = F.transform(toks, lambda t: bucket_expr(t, num_buckets))
    counts = F.array(
        *[
            F.size(F.filter(buckets, lambda b: b == F.lit(i))).cast("double")
            for i in range(num_buckets)
        ]
    )
    train = docs.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(counts).alias("features"),
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=reg)
    model = lr.fit(train)
    w = [int(round(float(c) * 1_000_000)) for c in model.coefficients]
    b = int(round(float(model.intercept) * 1_000_000))
    return b, w


def score_quality_frozen(
    docs: DataFrame,
    bias_micro: int,
    weights_micro: list[int],
    text_col: str = "text",
) -> DataFrame:
    """Score a corpus with a frozen integer-weight model — pure native
    expressions, zero shuffle, zero Python in the plan, exact in every
    engine.

    Adds ``ml_score_micro`` (logit in micro-units: bias + sum over
    tokens of the token's bucket weight — an exact BIGINT sum, so the
    value hash-matches across engines with no float-order caveats),
    ``ml_quality_prob`` (the sigmoid, for human ranking; floats, so NOT
    part of the oracle contract) and ``ml_keep`` (score >= 0, i.e.
    prob >= 0.5 — exact)."""
    n = len(weights_micro)
    wlit = F.array(*[F.lit(int(w)).cast("long") for w in weights_micro])
    toks = F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+', 0)")
    token_sum = F.aggregate(
        F.transform(
            toks, lambda t: F.element_at(wlit, (bucket_expr(t, n) + 1).cast("int"))
        ),
        F.lit(int(bias_micro)).cast("long"),
        lambda acc, w: acc + w,
    )
    return (
        docs.withColumn("ml_score_micro", token_sum)
        .withColumn(
            "ml_quality_prob",
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-F.col("ml_score_micro") / F.lit(1e6))),
                6,
            ),
        )
        .withColumn("ml_keep", F.col("ml_score_micro") >= 0)
    )


def calibration_report(
    scored: DataFrame,
    score_micro_col: str = "ml_score_micro",
    student_keep_col: str = "ml_keep",
    teacher_keep_col: str = "keep",
    bucket_micro: int = 2_000_000,
    clamp_micro: int = 10_000_000,
) -> DataFrame:
    """Classifier calibration / agreement audit — the table that
    answers "where on its own score axis does the deployed quality
    model disagree with the reference labeler?". Buckets the exact
    integer logit (micro-units) into fixed-width bands and reports,
    per band: doc count, student keeps, teacher keeps, and agreements.
    A well-behaved model agrees at the extremes and disagrees only
    near the boundary band; drift shows up as disagreement mass
    migrating outward — caught by diffing this tiny table across
    corpus versions, not by re-reading scores.

    Exactness: the bucket id is ``(clamped_score + clamp) div bucket``
    computed on NON-NEGATIVE BIGINTs — truncating division equals
    floor division on non-negative values, so Spark's ``div`` and
    DuckDB's ``//`` agree (signed ``div`` would NOT: Spark truncates
    toward zero, DuckDB floors). ``logit_lo_micro`` gives each band's
    inclusive lower edge back in score units. Scale shape: per-row
    codegen expressions into ONE partial-aggregated groupBy over at
    most ``2 * clamp div bucket + 1`` buckets — the corpus never
    shuffles, only per-partition partials do.
    """
    if bucket_micro < 1 or clamp_micro < bucket_micro:
        raise ValueError(
            f"need 1 <= bucket_micro <= clamp_micro, got "
            f"{bucket_micro}, {clamp_micro}"
        )
    clamped = F.least(
        F.greatest(F.col(score_micro_col), F.lit(-int(clamp_micro))),
        F.lit(int(clamp_micro)),
    ).cast("long")
    bucket = F.expr(
        f"(({score_micro_col}_clamped) + {int(clamp_micro)}) "
        f"div {int(bucket_micro)}"
    )
    student = F.col(student_keep_col).cast("boolean")
    teacher = F.col(teacher_keep_col).cast("boolean")
    return (
        scored.withColumn(f"{score_micro_col}_clamped", clamped)
        .withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(student, 1).otherwise(0))
            .cast("long")
            .alias("n_student_keep"),
            F.sum(F.when(teacher, 1).otherwise(0))
            .cast("long")
            .alias("n_teacher_keep"),
            F.sum(F.when(student.eqNullSafe(teacher), 1).otherwise(0))
            .cast("long")
            .alias("n_agree"),
        )
        .withColumn(
            "logit_lo_micro",
            (F.col("bucket") * int(bucket_micro) - int(clamp_micro)).cast(
                "long"
            ),
        )
    )
