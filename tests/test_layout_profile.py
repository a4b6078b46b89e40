"""Tests for the table profiler (operators/profile.py) and Z-order
layout (storage/layout.py): a pandas third-opinion on the statistics,
and a pruning-quality assertion that the Z-order buckets actually bound
both dimensions (the property the layout exists to provide)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_profile_matches_pandas(spark):
    from quantlab_data_pipeline_spark.operators.profile import profile_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    cols = ["l_orderkey", "l_quantity", "l_returnflag"]
    got = {r["column"]: r.asDict() for r in profile_table(li, cols).collect()}
    pdf = pd.read_parquet(f"{SF}/lineitem.parquet")

    assert set(got) == set(cols)
    for c in cols:
        assert got[c]["n_rows"] == len(pdf)
        assert got[c]["n_nulls"] == int(pdf[c].isna().sum())
        assert got[c]["n_distinct"] == pdf[c].nunique()
    assert got["l_orderkey"]["min_value"] == float(pdf["l_orderkey"].min())
    assert got["l_quantity"]["max_value"] == float(pdf["l_quantity"].max())
    assert got["l_orderkey"]["min_len"] is None
    lens = pdf["l_returnflag"].str.len()
    assert got["l_returnflag"]["min_len"] == int(lens.min())
    assert got["l_returnflag"]["max_len"] == int(lens.max())
    assert got["l_returnflag"]["avg_len"] == lens.sum() / lens.count()
    assert got["l_returnflag"]["min_value"] is None


def test_profile_approx_mode_single_pass(spark):
    """exact=False swaps countDistinct for HLL++ — values stay within
    the published ~2% relative error at this cardinality."""
    from quantlab_data_pipeline_spark.operators.profile import profile_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r["column"]: r["n_distinct"]
        for r in profile_table(li, ["l_orderkey", "l_partkey"]).collect()
    }
    approx = {
        r["column"]: r["n_distinct"]
        for r in profile_table(li, ["l_orderkey", "l_partkey"], exact=False).collect()
    }
    for c, v in exact.items():
        assert approx[c] == pytest.approx(v, rel=0.05)


def test_zorder_buckets_bound_both_dims(spark):
    """Each Z-order bucket's min/max box must cover a small cell of the
    2-D domain: the mean per-bucket area is a small fraction of the full
    domain area, and BOTH dimensions shrink — the property a
    single-column sort cannot give (it leaves the secondary column's
    range at ~full width)."""
    from quantlab_data_pipeline_spark.storage.layout import zorder_stats

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = zorder_stats(li, ["l_partkey", "l_suppkey"], bits=16, buckets=64).collect()
    assert 0 < len(rows) <= 64

    pdf = pd.read_parquet(f"{SF}/lineitem.parquet")
    full_p = pdf["l_partkey"].max() - pdf["l_partkey"].min()
    full_s = pdf["l_suppkey"].max() - pdf["l_suppkey"].min()

    p_spans = np.array([r["max_l_partkey"] - r["min_l_partkey"] for r in rows])
    s_spans = np.array([r["max_l_suppkey"] - r["min_l_suppkey"] for r in rows])
    # 64 buckets = an 8x8 grid of the 2-D domain: each dim should span
    # ~1/8 of its range per bucket; allow 2x slack for boundary cells.
    assert p_spans.mean() <= full_p / 4
    assert s_spans.mean() <= full_s / 4
    # row counts conserved
    assert sum(r["n_rows"] for r in rows) == len(pdf)


def test_zorder_validation_and_constant_column(spark):
    from quantlab_data_pipeline_spark.storage.layout import with_zorder

    li = spark.read.parquet(f"{SF}/lineitem.parquet").limit(100)
    with pytest.raises(ValueError, match="power of two"):
        with_zorder(li, ["l_partkey", "l_suppkey"], buckets=60)
    # constant column scales to 0 instead of dividing by zero
    const = li.withColumn("c1", li.l_partkey * 0)
    out = with_zorder(const, ["c1", "l_suppkey"], bits=8, buckets=4)
    got = out.select("zvalue", "zbucket").collect()
    assert all(r["zbucket"] is not None for r in got)


def test_impute_by_group_semantics(spark):
    """Median/mean/mode fills per group, smallest-value tie-break for
    mode, was-null flags, unknown strategy raises, and an all-null
    group keeps its nulls (no silent global fallback)."""
    import pytest as _pytest

    from quantlab_data_pipeline_spark.operators.impute import impute_by_group

    rows = [
        # g=1: values 1,3,None -> median 2.0; cat a,a,b,None -> mode 'a'
        (1, 1.0, "a"), (1, 3.0, "a"), (1, None, "b"), (1, None, None),
        # g=2: tie a:1 b:1 -> mode 'a' (smallest); all values null
        (2, None, "b"), (2, None, "a"),
    ]
    df = spark.createDataFrame(rows, "g int, v double, c string")
    out = {
        (r["g"], r["v"], r["c"], r["v_was_null"], r["c_was_null"])
        for r in impute_by_group(
            df, ["g"], {"v": "median", "c": "mode"}, flag_suffix="_was_null"
        ).collect()
    }
    assert (1, 2.0, "b", True, False) in out     # median fill, observed cat
    assert (1, 2.0, "a", True, True) in out      # both filled, mode='a'
    assert (2, None, "b", True, False) in out    # all-null group stays null
    assert (2, None, "a", True, False) in out
    with _pytest.raises(ValueError, match="unknown strategies"):
        impute_by_group(df, ["g"], {"v": "p99"})
    # mean strategy fills with the group average
    m = impute_by_group(df, ["g"], {"v": "mean"}, flag_suffix=None)
    got = {(r["g"], r["v"]) for r in m.collect()}
    assert (1, 2.0) in got and (1, 1.0) in got and (1, 3.0) in got


def test_cms_frequencies_bound(spark):
    """Count-Min guarantee on skewed data: never an undercount, and
    overcount bounded by eps * N (asserted at the published confidence
    via a fixed seed, so the test is deterministic)."""
    from pyspark.sql import functions as F

    from quantlab_data_pipeline_spark.operators.profile import cms_frequencies

    # Zipf-ish skew: key k appears ~30000/(k+1) times
    df = (
        spark.range(30_000)
        .select(F.floor(30_000 / (F.col("id") + 1)).cast("string").alias("k"))
    )
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    n = sum(exact.values())
    eps = 0.001
    watch = ["30000", "15000", "1", "2", "42", "nope"]
    got = {r["key"]: r["est_count"] for r in cms_frequencies(df, "k", watch, eps=eps).collect()}
    for k in watch:
        true = exact.get(k, 0)
        assert got[k] >= true, (k, got[k], true)
        assert got[k] <= true + eps * n, (k, got[k], true)


def test_psi_drift_detects_shift_and_stability(spark):
    """PSI ~ 0 when the distribution is unchanged, large when it
    shifts; a group constant in the baseline degenerates to one bin
    without dividing by zero."""
    from quantlab_data_pipeline_spark.operators.profile import psi_drift

    base_rows = (
        [("a", float(i % 100)) for i in range(2000)]
        + [("flat", 5.0)] * 50
    )
    same_rows = [("a", float((i * 7) % 100)) for i in range(2000)] + [
        ("flat", 5.0)
    ] * 50
    shifted_rows = [("a", 200.0 + float(i % 30)) for i in range(2000)] + [
        ("flat", 9.0)
    ] * 50
    schema = "event_type string, value double"
    base = spark.createDataFrame(base_rows, schema)
    same = spark.createDataFrame(same_rows, schema)
    shifted = spark.createDataFrame(shifted_rows, schema)

    stable = {r["event_type"]: r["psi"] for r in psi_drift(base, same).collect()}
    assert stable["a"] < 0.01          # same uniform distribution
    assert stable["flat"] == 0.0       # constant -> single bin, no drift

    drifted = {
        r["event_type"]: r["psi"] for r in psi_drift(base, shifted).collect()
    }
    # Everything clamps into the top edge bin -> near-total shift; with
    # p clamped at 1e-6 the PSI saturates in the double digits.
    assert drifted["a"] > 1.0
    assert drifted["flat"] == 0.0      # constant baseline stays one bin


def test_psi_drift_counts_and_schema(spark):
    from quantlab_data_pipeline_spark.operators.profile import psi_drift

    base = spark.createDataFrame(
        [("x", float(v)) for v in range(10)], "event_type string, value double"
    )
    cur = spark.createDataFrame(
        [("x", float(v)) for v in range(20)], "event_type string, value double"
    )
    row = psi_drift(base, cur).collect()[0]
    assert (row["n_base"], row["n_cur"]) == (10, 20)
    assert set(row.asDict()) == {"event_type", "n_base", "n_cur", "psi", "status"}
    assert row["psi"] >= 0.0
    assert row["status"] == "ok"


def test_psi_drift_one_sided_groups_flagged(spark):
    """A group that vanishes from (or newly appears in) a snapshot is
    the strongest drift signal — it must emit a sentinel row, not
    silently disappear from the monitor."""
    from quantlab_data_pipeline_spark.operators.profile import psi_drift

    schema = "event_type string, value double"
    base = spark.createDataFrame(
        [("keeps", float(v)) for v in range(10)]
        + [("vanishes", float(v)) for v in range(5)],
        schema,
    )
    cur = spark.createDataFrame(
        [("keeps", float(v)) for v in range(10)]
        + [("appears", float(v)) for v in range(7)],
        schema,
    )
    rows = {r["event_type"]: r for r in psi_drift(base, cur).collect()}
    assert set(rows) == {"keeps", "vanishes", "appears"}
    assert rows["keeps"]["status"] == "ok" and rows["keeps"]["psi"] is not None
    v = rows["vanishes"]
    assert (v["status"], v["psi"], v["n_base"], v["n_cur"]) == (
        "missing_group", None, 5, 0,
    )
    a = rows["appears"]
    assert (a["status"], a["psi"], a["n_base"], a["n_cur"]) == (
        "new_group", None, 0, 7,
    )


def test_column_minhash_join_profile(spark):
    """Identical key sets estimate 1.0, disjoint sets 0.0, and a
    50%-containment pair lands near its true Jaccard — the estimator
    quality that makes signature metadata usable for join discovery."""
    from pyspark.sql import functions as F
    from quantlab_data_pipeline_spark.operators.profile import (
        column_minhash_signature,
        join_key_overlap,
    )

    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    same = spark.range(0, 1000).select(F.col("id").alias("k"))
    disjoint = spark.range(5000, 6000).select(F.col("id").alias("k"))
    half = spark.range(500, 1500).select(F.col("id").alias("k"))

    sigs = None
    for name, df in [("a", a), ("same", same), ("dis", disjoint), ("half", half)]:
        s = column_minhash_signature(df, "k").select(
            F.lit(name).alias("column"), "signature"
        )
        sigs = s if sigs is None else sigs.unionAll(s)
    pairs = spark.createDataFrame(
        [("a", "same"), ("a", "dis"), ("a", "half")],
        "col_a string, col_b string",
    )
    got = {
        (r["col_a"], r["col_b"]): r["est_jaccard"]
        for r in join_key_overlap(sigs, pairs).collect()
    }
    assert got[("a", "same")] == 1.0
    assert got[("a", "dis")] == 0.0
    true_half = 500 / 1500  # |∩|=500, |∪|=1500
    assert abs(got[("a", "half")] - true_half) < 0.15


def test_join_key_overlap_containment_direction(spark):
    """Containment is directional: a subset key must read ~1.0 toward
    its superset and |A|/|B| the other way — the FK->PK signal Jaccard
    alone hides."""
    from pyspark.sql import functions as F
    from quantlab_data_pipeline_spark.operators.profile import (
        column_minhash_signature,
        join_key_overlap,
    )

    fk = spark.range(0, 200).select(F.col("id").alias("k"))     # subset
    pk = spark.range(0, 1000).select(F.col("id").alias("k"))    # superset
    sigs = column_minhash_signature(fk, "k").select(
        F.lit("fk").alias("column"), "signature"
    ).unionAll(
        column_minhash_signature(pk, "k").select(
            F.lit("pk").alias("column"), "signature"
        )
    )
    ndv = spark.createDataFrame(
        [("fk", 200.0), ("pk", 1000.0)], "column string, n_distinct double"
    )
    pairs = spark.createDataFrame([("fk", "pk")], "col_a string, col_b string")
    row = join_key_overlap(sigs, pairs, ndv=ndv).collect()[0]
    # true J = 200/1000 = 0.2; containment fk->pk = 1.0, pk->fk = 0.2
    assert abs(row["est_jaccard"] - 0.2) < 0.12
    assert row["est_containment_a"] > 0.8
    assert abs(row["est_containment_b"] - 0.2) < 0.12


def test_profile_drift_statuses(spark):
    """Each status fires on its own trigger: a null-rate jump, a
    cardinality collapse, and a stable column — and null-rate wins when
    both fire."""
    from quantlab_data_pipeline_spark.operators.profile import profile_drift

    a = spark.createDataFrame(
        [(i, f"u{i % 50}", float(i)) for i in range(200)],
        "id long, cat string, v double",
    )
    rows_b = [
        (i, f"u{i % 5}" if i % 2 else None, float(i)) for i in range(200)
    ]
    b = spark.createDataFrame(rows_b, "id long, cat string, v double")
    got = {
        r["column"]: r["status"] for r in profile_drift(a, b).collect()
    }
    assert got["id"] == "stable"
    assert got["v"] == "stable"
    # cat: null_frac 0 -> 0.5 (jump) AND ndv 50 -> 5 (shift); null wins
    assert got["cat"] == "null_rate_jump"

    c = spark.createDataFrame(
        [(i, f"u{i % 5}", float(i)) for i in range(200)],
        "id long, cat string, v double",
    )
    got2 = {r["column"]: r["status"] for r in profile_drift(a, c).collect()}
    assert got2["cat"] == "cardinality_shift"  # 50 -> 5, no nulls


def test_json_schema_profile_type_votes(spark):
    """int/double mixes widen to double (promoting to BIGINT would
    corrupt), pure types classify, JSON nulls vote for nothing, and
    presence fractions track absent keys."""
    from quantlab_data_pipeline_spark.operators.profile import (
        json_schema_profile,
    )

    rows = [
        ('{"a": 1, "b": true, "c": "x", "m": 1}',),
        ('{"a": 2, "b": false, "c": "y", "m": 2.5}',),
        ('{"a": 3, "b": true, "d": null}',),
        ('{"a": 4}',),
    ]
    df = spark.createDataFrame(rows, "j string")
    got = {r["key"]: r.asDict() for r in json_schema_profile(df, "j").collect()}

    assert got["a"]["inferred_type"] == "bigint"
    assert got["a"]["frac_present"] == 1.0
    assert got["b"]["inferred_type"] == "boolean"
    assert got["c"]["inferred_type"] == "string"
    assert got["c"]["n_present"] == 2 and got["c"]["frac_present"] == 0.5
    assert got["m"]["inferred_type"] == "double"  # 1 int + 1 double widens
    assert got["d"]["inferred_type"] == "null"    # only a JSON null seen


def test_json_schema_profile_null_struct_field_omitted(spark):
    """to_json drops null struct fields, so a conditionally-present key
    whose SOURCE is null never appears — the oracle for
    json_schema_profile_events must count presence as
    `value > 100 AND props IS NOT NULL`, not `value > 100` alone
    (baking in "props is never null" would diverge the oracle, not the
    query, on a future generator change)."""
    from pyspark.sql import functions as F
    from quantlab_data_pipeline_spark.operators.profile import (
        json_schema_profile,
    )

    ev = spark.createDataFrame(
        [
            (150.0, '{"k":"v"}'),   # value>100, props present -> raw emitted
            (150.0, None),          # value>100, props NULL -> raw omitted
            (50.0, '{"k":"v"}'),    # value<=100 -> raw omitted
        ],
        "value double, props string",
    )
    j = ev.select(
        F.to_json(
            F.struct(
                F.col("value").alias("val"),
                F.when(F.col("value") > 100, F.col("props")).alias("raw"),
            )
        ).alias("j")
    )
    got = {
        r["key"]: r.asDict()
        for r in json_schema_profile(j, "j", total=3).collect()
    }
    assert got["raw"]["n_present"] == 1
    assert got["raw"]["frac_present"] == round(1 / 3, 6)
    assert got["val"]["n_present"] == 3


def test_skew_profile_detects_zipf_hot_key(spark):
    """A uniform key reads skew_ratio ~1; a celebrity key dominating
    half the rows reads the ratio and top-share a salting decision
    needs."""
    from pyspark.sql import functions as F
    from quantlab_data_pipeline_spark.operators.skew import skew_profile

    uniform = spark.range(0, 10000).select((F.col("id") % 100).alias("k"))
    u = skew_profile(uniform, "k").collect()[0]
    assert u["n_keys"] == 100 and u["skew_ratio"] == 1.0
    assert u["top_share"] == 0.1  # 10 of 100 equal keys

    hot = spark.range(0, 10000).select(
        F.when(F.col("id") < 5000, 7).otherwise(F.col("id") % 100).alias("k")
    )
    h = skew_profile(hot, "k").collect()[0]
    # key 7 holds 5000 + its uniform share; mean freq = 100 rows/key
    assert h["max_freq"] > 5000
    assert h["skew_ratio"] > 50
    assert h["top_share"] > 0.5
