"""ANALYZE-style table profiling: per-column statistics in one pass.

The statistics a warehouse collects before anything else works well at
scale — null fractions for quality gates, distinct counts for join-side
selection and shuffle sizing, min/max for partition-prune sanity checks,
string lengths for memory estimates. The reference pipeline validates
its outputs with driver-side pandas checks
(`/root/reference/src/data_pipeline/ingestion/wrds_ingestion.py` run-log
summaries); this operator is the distributed equivalent: a single
wide aggregate over the table (one reduce, no per-column jobs), melted
JVM-side into one tidy row per column.

Distinct counts are exact by default (Spark plans multi-distinct via
expand — one logical pass). At 100 TB pass ``exact=False`` to use
``approx_count_distinct`` (HLL++, one real pass, ~2% error) — the
switch is per-call because the DuckDB correctness oracle needs the
exact variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..localframe import local_df

__all__ = [
    "cms_frequencies",
    "column_minhash_signature",
    "join_key_overlap",
    "json_schema_profile",
    "profile_drift",
    "profile_table",
    "psi_drift",
]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """One row per profiled column:

    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value,
    min_len, max_len, avg_len)``

    * numeric columns: ``min_value``/``max_value`` as double, length
      stats null;
    * string columns: length stats (``avg_len`` from an exact integer
      sum, so it is engine-reproducible), value bounds null;
    * other types: counts only.

    Single job: every statistic for every column is one aggregate list
    on one scan; the 1-row wide result is unpivoted with ``stack`` —
    still JVM-side, never through the driver.
    """
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    # rsd=0.01 sizes the HLL++ sketch for ~1% relative error — still a
    # few KB per column, and profiling is run rarely enough that the
    # tighter sketch is worth it.
    ndv = (
        F.countDistinct
        if exact
        else (lambda c: F.approx_count_distinct(c, rsd=0.01))
    )

    aggs, metrics = [], {}
    for c in cols:
        dt = schema[c]
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            ndv(c).alias(f"{c}__ndv"),
        ]
        is_num = isinstance(dt, _NUMERIC)
        is_str = isinstance(dt, T.StringType)
        if is_num:
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
            ]
        if is_str:
            aggs += [
                F.min(F.length(c)).cast("long").alias(f"{c}__minlen"),
                F.max(F.length(c)).cast("long").alias(f"{c}__maxlen"),
                (
                    F.sum(F.length(c)).cast("double")
                    / F.count(F.col(c)).cast("double")
                ).alias(f"{c}__avglen"),
            ]
        metrics[c] = (is_num, is_str)

    wide = df.agg(*aggs)

    def q(c: str) -> str:  # stack() literal
        return "'" + c.replace("'", "''") + "'"

    parts = []
    for c in cols:
        is_num, is_str = metrics[c]
        mn = f"`{c}__min`" if is_num else "cast(null as double)"
        mx = f"`{c}__max`" if is_num else "cast(null as double)"
        mnl = f"`{c}__minlen`" if is_str else "cast(null as bigint)"
        mxl = f"`{c}__maxlen`" if is_str else "cast(null as bigint)"
        avl = f"`{c}__avglen`" if is_str else "cast(null as double)"
        parts.append(
            f"{q(c)}, `{c}__rows`, `{c}__nulls`, `{c}__ndv`, {mn}, {mx}, {mnl}, {mxl}, {avl}"
        )
    stack = (
        f"stack({len(cols)}, " + ", ".join(parts) + ") as "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value, "
        "min_len, max_len, avg_len)"
    )
    return wide.selectExpr(stack)


def cms_frequencies(
    df: DataFrame,
    col: str,
    keys: list,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Approximate frequencies of a watchlist of ``keys`` via a
    Count-Min sketch — the frequency member of the sketch family next
    to HLL (distinct), KLL (quantiles), and GK (percentile_approx).

    Guarantee: ``true <= estimate <= true + eps * N`` with probability
    ``confidence`` (N = total rows) — never an undercount, so a
    watchlist alert on "key seen more than T times" has no false
    negatives. The sketch itself is a few KB regardless of N: Spark
    builds one per partition and merges them (`df.stat.countMinSketch`
    — the merge is associative, so this scales like any treeAggregate;
    only the final KB-scale sketch reaches the driver, never data).

    Returns a small DataFrame (key, est_count) for the watchlist —
    driver-built from the merged sketch, sized by ``len(keys)``.

    PySpark 4 removed the Python ``df.stat.countMinSketch`` wrapper
    (the SQL ``count_min_sketch`` aggregate remains, but ships no probe
    function), so this goes through the JVM stat API directly —
    classic-mode only, which is this repo's runtime.
    """
    sketch = df._jdf.stat().countMinSketch(
        col, float(eps), float(confidence), int(seed)
    )
    rows = [(k, int(sketch.estimateCount(k))) for k in keys]
    key_type = "string" if rows and isinstance(rows[0][0], str) else "long"
    return local_df(
        df.sparkSession, rows, f"key {key_type}, est_count long"
    )


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots, per group —
    the standard drift alarm for a production feature/ingest pipeline
    (PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 investigate).

    Bins are ``bins`` equal-width slices of the BASELINE's exact
    per-group [min, max] (out-of-range current values clamp into the
    edge bins; a constant baseline degenerates to one bin). Equal-width
    rather than quantile bins keeps the whole statistic a deterministic
    closed-form over exact aggregates — engine-reproducible, so the
    DuckDB oracle replays it to the last rounding — where interpolated
    quantile cuts differ across engines in the last ulp and flip
    boundary rows. Empty-bin proportions clamp to ``eps`` (the textbook
    guard, else ln() diverges).

    Scale shape: two group-sized aggregates + one (group, bin)-keyed
    count per side — nothing row-quadratic, the per-group stats frame
    broadcasts, and partial aggregation absorbs hot groups map-side.

    One-sided groups are the strongest drift signal and MUST surface:
    a group present only in the baseline (vanished from current) or
    only in current (brand-new) gets a sentinel row — psi NULL,
    ``status`` 'missing_group' / 'new_group', zero-filled count on the
    absent side — instead of silently dropping out of the monitor.
    Two-sided groups carry ``status`` 'ok'.
    """
    gcols = list(group_cols)
    stats = baseline.groupBy(*gcols).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
        idx = (
            F.when(F.col("__hi") <= F.col("__lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col(value_col) - F.col("__lo")) / width
                        ).cast("int"),
                    ),
                )
            )
        )
        return (
            df.join(F.broadcast(stats), gcols)
            .select(*gcols, idx.alias("__bin"))
            .groupBy(*gcols, "__bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    a = binned(baseline, "n_a")
    b = binned(current, "n_b")
    per_bin = a.join(b, gcols + ["__bin"], "full_outer").fillna(
        0, subset=["n_a", "n_b"]
    )
    totals_a = baseline.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n_base"))
    totals_b = current.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n_cur"))
    # Full-outer: a group with zero rows on one side must NOT vanish
    # (the inner joins this replaces dropped exactly the groups whose
    # disappearance the monitor exists to catch).
    totals = totals_a.join(totals_b, gcols, "full_outer").fillna(
        0, subset=["n_base", "n_cur"]
    )
    pa = F.greatest(F.col("n_a") / F.col("n_base"), F.lit(eps))
    pb = F.greatest(F.col("n_b") / F.col("n_cur"), F.lit(eps))
    term = (pa - pb) * F.log(pa / pb)
    scored = (
        per_bin.join(F.broadcast(totals), gcols)
        .filter((F.col("n_base") > 0) & (F.col("n_cur") > 0))
        .groupBy(*gcols, "n_base", "n_cur")  # totals are per-group constants
        .agg(F.round(F.sum(term), 6).alias("psi"))
        .withColumn("status", F.lit("ok"))
    )
    one_sided = totals.filter(
        (F.col("n_base") == 0) | (F.col("n_cur") == 0)
    ).select(
        *gcols,
        "n_base",
        "n_cur",
        F.lit(None).cast("double").alias("psi"),
        F.when(F.col("n_cur") == 0, F.lit("missing_group"))
        .otherwise(F.lit("new_group"))
        .alias("status"),
    )
    return scored.unionByName(one_sided)


def column_minhash_signature(
    df: DataFrame, col: str, num_hashes: int = 64
) -> DataFrame:
    """One-row (column, signature) MinHash of a column's DISTINCT value
    set — the join-ability fingerprint a data catalog keeps per column.
    Two columns' signatures estimate the Jaccard of their key sets
    without ever joining the tables: KB of metadata answers "can these
    join?" across a 100 TB lake where the exact intersection is a
    fact-fact shuffle per candidate pair.

    One pass: distinct -> md5 base hash -> num_hashes Carter-Wegman
    min-aggregates (the same engine-portable family as
    ``llm.dedup.minhash_signatures``, so stored fingerprints replay in
    any engine). The exact distinct count rides along in the SAME
    aggregate (the frame is already distinct, so it is a free
    ``count``) — :func:`join_key_overlap` needs it for containment, and
    a second count-distinct pass over a 100 TB column would double the
    profiling cost. Output is a single row; persist these per column
    and compare signatures pairwise at planning time.
    """
    from ..llm.dedup import MINHASH_PRIME, minhash_coefficients, portable_hash32

    coeffs = minhash_coefficients(num_hashes)
    h = portable_hash32(F.col(col).cast("string"))
    base = df.select(col).where(F.col(col).isNotNull()).distinct().select(
        h.alias("__h")
    )
    slots = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % MINHASH_PRIME).alias(
            f"__s{i}"
        )
        for i, (a, b) in enumerate(coeffs)
    ]
    return base.agg(
        *slots, F.count(F.lit(1)).cast("double").alias("__ndv")
    ).select(
        F.lit(col).alias("column"),
        F.array(*[F.col(f"__s{i}") for i in range(num_hashes)]).alias(
            "signature"
        ),
        F.col("__ndv").alias("n_distinct"),
    )


def join_key_overlap(
    sigs: DataFrame,
    pairs: DataFrame,
    num_hashes: int = 64,
    ndv: DataFrame | None = None,
) -> DataFrame:
    """(col_a, col_b, est_jaccard[, est_containment_a,
    est_containment_b]) for each requested column pair —
    signature-slot agreement, the standard unbiased MinHash estimator.
    ``sigs`` is a union of :func:`column_minhash_signature` rows (one
    per column, KB-scale); ``pairs`` lists the candidate pairs so the
    comparison is an equi-join, never a signature cross product.

    With ``ndv`` — a (column, n_distinct) frame, e.g. from
    :func:`profile_table` — the Jaccard converts to directional
    CONTAINMENT, the statistic FK→PK discovery actually needs (a
    foreign key is fully contained in a small dim key yet their
    Jaccard is tiny): |A∩B| = J/(1+J)·(|A|+|B|), containment_a =
    |A∩B|/|A|, clamped to [0, 1] against estimator noise.
    """
    a = sigs.select(
        F.col("column").alias("col_a"), F.col("signature").alias("sig_a")
    )
    b = sigs.select(
        F.col("column").alias("col_b"), F.col("signature").alias("sig_b")
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    out = (
        pairs.join(a, "col_a")
        .join(b, "col_b")
        .withColumn("est_jaccard", F.round(agree / F.lit(float(num_hashes)), 6))
    )
    if ndv is None:
        return out.select("col_a", "col_b", "est_jaccard")
    na = ndv.select(
        F.col("column").alias("col_a"), F.col("n_distinct").alias("__na")
    )
    nb = ndv.select(
        F.col("column").alias("col_b"), F.col("n_distinct").alias("__nb")
    )
    inter = (
        F.col("est_jaccard")
        / (F.lit(1.0) + F.col("est_jaccard"))
        * (F.col("__na") + F.col("__nb"))
    )
    clamp = lambda c: F.least(F.lit(1.0), F.greatest(F.lit(0.0), c))  # noqa: E731
    return (
        out.join(F.broadcast(na), "col_a")
        .join(F.broadcast(nb), "col_b")
        .select(
            "col_a",
            "col_b",
            "est_jaccard",
            F.round(clamp(inter / F.col("__na")), 6).alias("est_containment_a"),
            F.round(clamp(inter / F.col("__nb")), 6).alias("est_containment_b"),
        )
    )


def profile_drift(
    a: DataFrame,
    b: DataFrame,
    columns: list[str] | None = None,
    null_frac_alert: float = 0.1,
    ndv_ratio_alert: float = 2.0,
) -> DataFrame:
    """Structural drift between two snapshots — the schema/statistics
    complement to :func:`psi_drift`'s value-distribution drift: per
    column, both sides' row/null/distinct profile plus a deterministic
    status (``null_rate_jump`` when the null fraction moves more than
    ``null_frac_alert`` absolute, ``cardinality_shift`` when the
    distinct count moves more than ``ndv_ratio_alert``-fold either
    way, else ``stable``; null-rate wins when both fire — it is the
    more actionable alarm). One :func:`profile_table` pass per side
    (single wide aggregate each) joined on the column name — the
    output is column-count sized, never data-sized.
    """
    pa = profile_table(a, columns).select(
        "column",
        F.col("n_rows").alias("n_rows_a"),
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac_a"),
        F.col("n_distinct").alias("ndv_a"),
    )
    pb = profile_table(b, columns).select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac_b"),
        F.col("n_distinct").alias("ndv_b"),
    )
    j = pa.join(pb, "column")
    null_jump = (
        F.abs(F.col("null_frac_b") - F.col("null_frac_a")) > null_frac_alert
    )
    ratio = F.greatest(
        F.col("ndv_b") / F.greatest(F.col("ndv_a"), F.lit(1)),
        F.col("ndv_a") / F.greatest(F.col("ndv_b"), F.lit(1)),
    )
    status = (
        F.when(null_jump, "null_rate_jump")
        .when(ratio > ndv_ratio_alert, "cardinality_shift")
        .otherwise("stable")
    )
    return j.select(
        "column",
        "n_rows_a",
        "n_rows_b",
        "null_frac_a",
        "null_frac_b",
        "ndv_a",
        "ndv_b",
        status.alias("status"),
    )


def json_schema_profile(
    df: DataFrame, json_col: str, total: int | None = None
) -> DataFrame:
    """Schema inference over a semi-structured JSON column — the
    profiling a lake runs before promoting raw JSON to typed columns:
    per key, how often it appears and what type its values actually
    are, decided by deterministic try-cast voting (priority bool >
    bigint > double > string; ties impossible by construction since
    every value matches exactly one first rule; JSON nulls vote for no
    type). ``inferred_type`` widens int+double mixes to double —
    promoting such a key to BIGINT would corrupt data, the exact
    mistake this profile exists to prevent.

    One ``from_json`` to map + one explode + one keyed aggregate —
    key-cardinality-sized output, map-side partials absorb hot keys.
    ``total`` (row count) normally rides in from the caller's own
    count; when None a separate count job runs.
    """
    if total is None:
        total = df.count()
    kv = df.select(
        F.explode(F.from_json(F.col(json_col), "map<string,string>")).alias(
            "key", "val"
        )
    )
    is_bool = F.col("val").isin("true", "false")
    is_int = (~is_bool) & F.expr("try_cast(val AS BIGINT)").isNotNull()
    is_double = (
        (~is_bool)
        & F.expr("try_cast(val AS BIGINT)").isNull()
        & F.expr("try_cast(val AS DOUBLE)").isNotNull()
    )
    is_string = (
        F.col("val").isNotNull() & ~is_bool & ~is_int & ~is_double
    )
    agg = kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(is_bool.cast("long")).alias("n_bool"),
        F.sum(is_int.cast("long")).alias("n_int"),
        F.sum(is_double.cast("long")).alias("n_double"),
        F.sum(is_string.cast("long")).alias("n_string"),
    )
    top = F.greatest("n_bool", "n_int", "n_double", "n_string")
    inferred = (
        F.when(top == 0, "null")
        .when(
            (F.col("n_int") + F.col("n_double") == top + F.least("n_int", "n_double"))
            & (F.col("n_double") > 0)
            & (F.col("n_int") > 0)
            & (F.col("n_bool") == 0)
            & (F.col("n_string") == 0),
            "double",  # int/double mix widens
        )
        .when(F.col("n_bool") == top, "boolean")
        .when(F.col("n_int") == top, "bigint")
        .when(F.col("n_double") == top, "double")
        .otherwise("string")
    )
    return agg.select(
        "key",
        "n_present",
        F.round(F.col("n_present") / F.lit(float(total)), 6).alias(
            "frac_present"
        ),
        "n_bool",
        "n_int",
        "n_double",
        "n_string",
        inferred.alias("inferred_type"),
    )
