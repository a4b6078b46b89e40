"""Property-based checks (hypothesis): Spark operators vs independent
pandas oracles on randomly generated frames. The reference has no
property testing (SURVEY §5); these pin the operator semantics the
example-based tests can't sweep — tie handling, empty groups, all-null
columns, missing keys.

Examples are capped low: each example runs Spark jobs, so the value is
in the generator's edge-case bias (empty frames, duplicate timestamps,
single-key data), not in volume.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.sampled_from(["A", "B", "C"])
ts_vals = st.integers(min_value=0, max_value=30)


@st.composite
def asof_frames(draw):
    n_left = draw(st.integers(0, 12))
    n_right = draw(st.integers(0, 12))
    left = [(draw(keys), draw(ts_vals), i) for i in range(n_left)]
    right = [(draw(keys), draw(ts_vals), float(i)) for i in range(n_right)]
    return left, right


@given(asof_frames())
@SETTINGS
def test_as_of_join_matches_pandas_merge_asof(spark, frames):
    from quantlab_data_pipeline_spark.operators.asof import as_of_join

    left_rows, right_rows = frames
    left = spark.createDataFrame(
        left_rows, "key string, ts long, row_id long"
    ) if left_rows else spark.createDataFrame([], "key string, ts long, row_id long")
    right = spark.createDataFrame(
        right_rows, "key string, ts long, px double"
    ) if right_rows else spark.createDataFrame([], "key string, ts long, px double")

    got = (
        as_of_join(left, right, on=["key"])
        .toPandas()
        .sort_values(["key", "ts", "row_id"])
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(left_rows, columns=["key", "ts", "row_id"])
    rp = pd.DataFrame(right_rows, columns=["key", "ts", "px"])
    if len(lp) == 0:
        assert len(got) == 0
        return
    if len(rp) == 0:
        # merge_asof can't type an empty right frame; expected = all null
        exp = lp.sort_values(["key", "ts", "row_id"]).reset_index(drop=True)
        exp["asof_ts"] = pd.Series([None] * len(exp), dtype="float")
        exp["asof_px"] = pd.Series([None] * len(exp), dtype="float")
    else:
        # Mirror the operator's pinned tie semantics: among right rows
        # sharing (key, ts) the largest payload tuple wins (pandas
        # merge_asof alone is unstable-sort-dependent on such ties).
        rp = rp.groupby(["key", "ts"], as_index=False)["px"].max()
        # pandas merge_asof: backward-inclusive, same semantics.
        rp_sorted = rp.sort_values(["ts"]).reset_index(drop=True)
        exp = pd.merge_asof(
            lp.sort_values("ts").reset_index(drop=True),
            rp_sorted.rename(columns={"ts": "asof_ts", "px": "asof_px"}),
            left_on="ts",
            right_on="asof_ts",
            by="key",
            direction="backward",
        ).sort_values(["key", "ts", "row_id"]).reset_index(drop=True)

    assert len(got) == len(exp)
    for col in ["key", "ts", "row_id"]:
        assert (got[col] == exp[col]).all()
    pd.testing.assert_series_equal(
        got["asof_px"], exp["asof_px"], check_names=False, check_dtype=False
    )
    pd.testing.assert_series_equal(
        got["asof_ts"].astype("float"), exp["asof_ts"].astype("float"),
        check_names=False, check_dtype=False,
    )


@st.composite
def delist_frames(draw):
    n = draw(st.integers(0, 10))
    rets = [
        (draw(st.sampled_from([1, 2, 3])), draw(st.integers(0, 5)),
         draw(st.floats(-0.5, 0.5, allow_nan=False)))
        for _ in range(n)
    ]
    m = draw(st.integers(0, 4))
    # unique (asset, day) delist events
    seen = set()
    dl = []
    for _ in range(m):
        a, d = draw(st.sampled_from([1, 2, 3])), draw(st.integers(0, 5))
        if (a, d) not in seen:
            seen.add((a, d))
            dl.append((a, d, draw(st.floats(-0.9, 0.1, allow_nan=False))))
    return rets, dl


@given(delist_frames())
@SETTINGS
def test_delist_adjust_matches_pandas(spark, frames):
    from quantlab_data_pipeline_spark.operators.returns import delist_adjust

    rets, dl = frames
    returns = spark.createDataFrame(
        rets, "asset_id long, date long, ret_1d double"
    ) if rets else spark.createDataFrame([], "asset_id long, date long, ret_1d double")
    delists = spark.createDataFrame(
        dl, "asset_id long, date long, dlret double"
    ) if dl else spark.createDataFrame([], "asset_id long, date long, dlret double")

    got = (
        delist_adjust(returns, delists, ret_col="ret_1d")
        .toPandas()
        .sort_values(["asset_id", "date", "ret_1d"])
        .reset_index(drop=True)
    )

    rp = pd.DataFrame(rets, columns=["asset_id", "date", "ret_1d"])
    dp = pd.DataFrame(dl, columns=["asset_id", "date", "dlret"])
    if len(rp) == 0:
        assert len(got) == 0
        return
    exp = rp.merge(dp, on=["asset_id", "date"], how="left")
    exp["dlret"] = exp["dlret"].fillna(0.0)
    exp["ret_1d"] = (1 + exp["ret_1d"]) * (1 + exp["dlret"]) - 1
    exp = exp.drop(columns=["dlret"]).sort_values(
        ["asset_id", "date", "ret_1d"]
    ).reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["ret_1d"], exp["ret_1d"], check_names=False, check_exact=False
    )


@st.composite
def dedup_frames(draw):
    n = draw(st.integers(1, 15))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.sampled_from([10, 20])),          # key
                i,                                          # order (unique)
                draw(st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))),
                draw(st.one_of(st.none(), st.floats(0, 9, allow_nan=False))),
            )
        )
    return rows


@given(dedup_frames())
@SETTINGS
def test_dedupe_first_non_null_matches_pandas(spark, rows):
    from quantlab_data_pipeline_spark.operators.dedup import dedupe_first_non_null

    df = spark.createDataFrame(rows, "key long, ord long, s string, v double")
    got = {
        r["key"]: (r["s"], r["v"])
        for r in dedupe_first_non_null(df, keys=["key"], order="ord").collect()
    }

    pdf = pd.DataFrame(rows, columns=["key", "ord", "s", "v"]).sort_values("ord")
    for key, g in pdf.groupby("key"):
        s = next((x for x in g["s"] if x is not None), None)
        v = next((x for x in g["v"] if x is not None and x == x), None)
        gs, gv = got[key]
        assert gs == s
        assert (gv is None and v is None) or abs(gv - v) < 1e-12


@st.composite
def pit_frames(draw):
    n_facts = draw(st.integers(0, 10))
    facts = [
        (draw(st.sampled_from(["g1", "g2"])), draw(st.integers(0, 20)), i)
        for i in range(n_facts)
    ]
    n_links = draw(st.integers(0, 6))
    links = []
    for j in range(n_links):
        start = draw(st.integers(0, 20))
        end = draw(st.one_of(st.none(), st.integers(0, 20)))
        links.append((draw(st.sampled_from(["g1", "g2"])), start, end, 100 + j))
    return facts, links


@given(pit_frames())
@SETTINGS
def test_point_in_time_join_matches_scan(spark, frames):
    """J4 semantics vs a brute-force scan: a fact row pairs with every
    link of its key whose [valid_from, valid_to] interval contains the
    as-of value (null valid_to = open-ended)."""
    from quantlab_data_pipeline_spark.operators.intervals import point_in_time_join

    facts_rows, link_rows = frames
    facts = spark.createDataFrame(
        facts_rows, "gvkey string, asof long, fact_id long"
    ) if facts_rows else spark.createDataFrame([], "gvkey string, asof long, fact_id long")
    links = spark.createDataFrame(
        link_rows, "gvkey string, valid_from long, valid_to long, link_id long"
    ) if link_rows else spark.createDataFrame(
        [], "gvkey string, valid_from long, valid_to long, link_id long"
    )

    got = {
        (r["fact_id"], r["link_id"])
        for r in point_in_time_join(
            facts, links, key="gvkey", as_of_col="asof",
            valid_from="valid_from", valid_to="valid_to",
        ).collect()
    }
    exp = {
        (f[2], l[3])
        for f in facts_rows
        for l in link_rows
        if f[0] == l[0] and f[1] >= l[1] and (l[2] is None or f[1] <= l[2])
    }
    assert got == exp


@st.composite
def ibes_snapshots(draw):
    """Random tr_ibes.id-like snapshots: a few tickers, each with 1-6
    snapshot dates drawn with replacement from a small CUSIP pool (so
    runs repeat, recycle, and interleave)."""
    rows = []
    for t in draw(st.lists(st.sampled_from(["AA", "BB", "CC"]),
                           min_size=1, max_size=3, unique=True)):
        n = draw(st.integers(1, 6))
        dates = sorted(draw(st.lists(
            st.integers(0, 400), min_size=n, max_size=n, unique=True)))
        for d in dates:
            rows.append((t, draw(st.sampled_from(["X1", "X2", "X3"])), d))
    return rows


@given(ibes_snapshots())
@SETTINGS
def test_derive_ibes_coverage_matches_python_islands(spark, rows):
    """Invariants vs a direct python derivation: per ticker, windows are
    disjoint, ordered, gap-free (each ends the day before the next
    starts), the last is open, and the CUSIP sequence equals the
    run-length-collapsed snapshot sequence."""
    import datetime as dt

    from quantlab_data_pipeline_spark.operators import derive_ibes_coverage

    base = dt.date(2000, 1, 1)
    data = [(t, c, f"{t} Co", base + dt.timedelta(days=d), None)
            for (t, c, d) in rows]
    df = spark.createDataFrame(
        data,
        "ticker string, cusip string, cname string, start_date date, end_date date",
    )
    got = sorted(
        ((r["ticker"], r["cusip"], r["start_date"], r["end_date"])
         for r in derive_ibes_coverage(df).collect()),
        key=lambda x: (x[0], x[2]),
    )

    # python oracle: collapse consecutive same-cusip snapshots per ticker
    expect = []
    by_ticker: dict = {}
    for t, c, d in sorted(rows):
        by_ticker.setdefault(t, []).append((d, c))
    for t, snaps in by_ticker.items():
        islands = []
        for d, c in sorted(snaps):
            if islands and islands[-1][1] == c:
                continue
            islands.append((d, c))
        for i, (d, c) in enumerate(islands):
            end = (base + dt.timedelta(days=islands[i + 1][0] - 1)
                   if i + 1 < len(islands) else None)
            expect.append((t, c, base + dt.timedelta(days=d), end))
    expect.sort(key=lambda x: (x[0], x[2]))
    assert got == expect


# ---------------------------------------------- gram run-length stats


@st.composite
def word_docs(draw):
    """Docs from a tiny vocabulary so gram repeats actually occur."""
    vocab = ["aa", "bb", "cc", "dd"]
    n = draw(st.integers(0, 18))
    return " ".join(draw(st.sampled_from(vocab)) for _ in range(n))


def _python_gram_stats(text: str, k: int):
    """Oracle: the per-distinct-gram counting the run-length pass replaces."""
    from collections import Counter

    words = [w for w in text.lower().split() if w]
    grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    counts = Counter(grams)
    total = sum(len(g) * c for g, c in counts.items())
    dup = sum(len(g) * c for g, c in counts.items() if c > 1)
    best_cov = 0
    if counts:
        mx = max(counts.values())
        if mx > 1:
            best_cov = max(len(g) * c for g, c in counts.items() if c == mx)
    return best_cov, dup, total


@given(st.lists(word_docs(), min_size=1, max_size=6), st.sampled_from([2, 3]))
@SETTINGS
def test_gram_run_stats_match_python_counter(spark, docs, k):
    from quantlab_data_pipeline_spark.llm.text import _gram_run_stats

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", _gram_run_stats(F.col("text"), k).alias("s")
        ).collect()
    }
    for i, d in enumerate(docs):
        best_cov, dup, total = _python_gram_stats(d, k)
        s = got[i]
        assert s["best_cov"] == best_cov, (d, k)
        assert s["dup"] == dup, (d, k)
        assert s["total"] == total, (d, k)


@st.composite
def token_sizes(draw):
    n = draw(st.integers(1, 60))
    return [draw(st.integers(1, 120)) for _ in range(n)]


@given(token_sizes(), st.sampled_from([64, 100]))
@SETTINGS
def test_pack_documents_invariants(spark, sizes, budget):
    from quantlab_data_pipeline_spark.llm import pack_documents

    df = spark.createDataFrame(
        [(i, int(t)) for i, t in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    rows = pack_documents(
        df, budget, token_col="n_tokens", partitions=2
    ).collect()
    assert len(rows) == len(sizes)  # every doc packed exactly once
    fills: dict[int, int] = {}
    positions: dict[int, list[int]] = {}
    for r in rows:
        assert r["oversize"] == (r["n_tokens"] > budget)
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["n_tokens"]
        positions.setdefault(r["pack_id"], []).append(r["pack_pos"])
    for pid, fill in fills.items():
        members = positions[pid]
        oversize_pack = any(
            r["oversize"] for r in rows if r["pack_id"] == pid
        )
        if oversize_pack:
            assert len(members) == 1  # oversize docs stay singletons
        else:
            assert fill <= budget
        assert sorted(members) == list(range(len(members)))


@st.composite
def line_corpora(draw):
    pool = [f"shared pool line number {i} with padding" for i in range(4)] + [
        f"unique line {i} for one document only zz" for i in range(30)
    ]
    n_docs = draw(st.integers(1, 8))
    docs = []
    for d in range(1, n_docs + 1):
        n_lines = draw(st.integers(0, 5))
        docs.append(
            (d, "\n".join(draw(st.sampled_from(pool)) for _ in range(n_lines)))
        )
    return docs


@given(line_corpora())
@SETTINGS
def test_dedup_lines_property_first_occurrence(spark, docs):
    from quantlab_data_pipeline_spark.llm import dedup_lines

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines_dropped"])
        for r in dedup_lines(df, min_chars=15).collect()
    }
    first: dict[str, tuple[int, int]] = {}
    for d, text in docs:
        for i, ln in enumerate(text.split("\n")):
            key = ln.strip().lower()
            if len(key) >= 15 and key not in first:
                first[key] = (d, i)
    for d, text in docs:
        keep, dropped = [], 0
        for i, ln in enumerate(text.split("\n")):
            key = ln.strip().lower()
            if len(key) < 15 or first[key] == (d, i):
                keep.append(ln)
            else:
                dropped += 1
        assert got[d] == ("\n".join(keep), dropped), (d, text)


@given(token_sizes(), st.sampled_from([32, 128]), st.integers(1, 5))
@SETTINGS
def test_chunk_plan_property_offsets(spark, sizes, budget, parts):
    from quantlab_data_pipeline_spark.llm import chunk_plan

    df = spark.createDataFrame(
        [(i, int(t)) for i, t in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    rows = sorted(
        chunk_plan(
            df, budget, token_col="n_tokens", partitions=parts
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    acc = 0
    for r in rows:
        assert r["offset"] == acc
        acc += r["n_tokens"] + 1
        assert r["first_chunk"] == r["offset"] // budget
        end = r["offset"] + r["n_tokens"] + 1 - 1
        assert r["last_chunk"] == max(end // budget, r["offset"] // budget)


@st.composite
def rollup_batches(draw):
    """Random event rows split into 1-3 refresh batches at random."""
    n = draw(st.integers(1, 24))
    rows = [
        (
            i,
            draw(st.integers(1, 4)),   # day
            draw(st.sampled_from(["a", "b"])),
            float(draw(st.integers(-5, 5))),
        )
        for i in range(n)
    ]
    cut1 = draw(st.integers(0, n))
    cut2 = draw(st.integers(cut1, n))
    return rows, cut1, cut2


@given(rollup_batches())
@SETTINGS
def test_rollup_refresh_is_split_invariant(spark, tmp_path_factory, data):
    """Any split of the fact into build + refreshes yields the same
    store as a one-shot aggregation (additive-merge associativity)."""
    import datetime as dt

    from quantlab_data_pipeline_spark.storage.rollup import (
        build_rollup,
        read_rollup,
        refresh_rollup,
    )

    rows, cut1, cut2 = data
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def df(slice_rows):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 5, d, 12, 0), 1, t, v, None)
                for (i, d, t, v) in slice_rows
            ],
            schema,
        )

    path = str(tmp_path_factory.mktemp("prop_rollup") / "r")
    first, second, third = rows[:cut1], rows[cut1:cut2], rows[cut2:]
    build_rollup(df(first), path, "ts", ["event_type"], "value")
    for batch in (second, third):
        if batch:
            refresh_rollup(df(batch), path, "ts", ["event_type"], "value")

    got = {
        (r["grain_key"], r["event_type"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in read_rollup(spark, path).collect()
    }
    exp = {}
    for (_, d, t, v) in rows:
        k = (f"2024-05-{d:02d}", t)
        n, s, mn, mx = exp.get(k, (0, 0.0, float("inf"), float("-inf")))
        exp[k] = (n + 1, s + v, min(mn, v), max(mx, v))
    assert got == exp


@st.composite
def scd2_changelogs(draw):
    """Per-key change logs split at a time threshold (the CDC-append
    contract scd2_apply_changes documents)."""
    n = draw(st.integers(1, 14))
    rows = [
        (
            draw(st.sampled_from(["k1", "k2"])),
            draw(st.integers(0, 20)),          # ts
            draw(st.sampled_from(["A", "B", None])),
        )
        for _ in range(n)
    ]
    cut_ts = draw(st.integers(0, 21))
    return rows, cut_ts


@given(scd2_changelogs())
@SETTINGS
def test_scd2_apply_changes_is_split_invariant(spark, data):
    """scd2(initial) + apply(batch) == scd2(all) for ANY time-threshold
    split of the change log (the documented CDC-append contract)."""
    from quantlab_data_pipeline_spark.operators.scd2 import (
        scd2_apply_changes,
        scd2_from_changelog,
    )

    rows, cut_ts = data
    schema = "k string, ts long, val string"
    all_df = spark.createDataFrame(rows, schema)
    initial = [r for r in rows if r[1] < cut_ts]
    batch = [r for r in rows if r[1] >= cut_ts]

    def canon(df):
        return {
            (r["k"], r["val"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in df.collect()
        }

    one_shot = canon(
        scd2_from_changelog(all_df, ["k"], "ts", ["val"], ["val"])
    )
    dim = scd2_from_changelog(
        spark.createDataFrame(initial, schema) if initial
        else all_df.limit(0),
        ["k"], "ts", ["val"], ["val"],
    )
    merged = canon(
        scd2_apply_changes(
            dim,
            spark.createDataFrame(batch, schema) if batch
            else all_df.limit(0),
            ["k"], "ts", ["val"], ["val"],
        )
    )
    assert merged == one_shot


@st.composite
def split_weight_dicts(draw):
    n = draw(st.integers(2, 4))
    names = [f"s{i}" for i in range(n)]
    ws = [draw(st.floats(0.05, 1.0)) for _ in names]
    return dict(zip(names, ws))


@given(split_weight_dicts(), st.integers(5, 60))
@SETTINGS
def test_stratified_split_counts_property(spark, weights, n_rows):
    """For ANY weight dict and stratum size, the per-stratum counts hit
    the floor(cum_frac*n) boundaries exactly and cover every row."""
    from quantlab_data_pipeline_spark.llm.text import stratified_split

    rows = [(i, "x" if i % 2 == 0 else "y") for i in range(n_rows)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_split(df, weights=weights).collect()
    assert len(out) == n_rows
    per: dict = {}
    for r in out:
        per.setdefault(r["source"], {}).setdefault(r["split"], 0)
        per[r["source"]][r["split"]] += 1
    items = sorted(weights.items())
    total = sum(weights.values())
    for src, counts in per.items():
        n = sum(counts.values())
        cum, prev_boundary = 0.0, 0
        for name, w in items[:-1]:
            cum += w / total
            boundary = int(cum * n)
            assert counts.get(name, 0) == boundary - prev_boundary, (src, name)
            prev_boundary = boundary
        assert counts.get(items[-1][0], 0) == n - prev_boundary


@st.composite
def impute_frames(draw):
    n = draw(st.integers(0, 15))
    rows = []
    for i in range(n):
        g = draw(st.integers(0, 2))
        # Subnormals excluded: the two-value median is (a+b)/2 in
        # pandas/numpy but lower+(upper-lower)*0.5 inside Spark's
        # percentile — algebraically equal, and equal in IEEE doubles
        # for all normal inputs, but the subtraction loses the last
        # ulp in the subnormal range (hypothesis found
        # (5e-324, 2.2e-311) diverging at the 13th digit).
        v = draw(
            st.one_of(
                st.none(),
                st.floats(-100, 100, allow_nan=False, allow_subnormal=False),
            )
        )
        rows.append((g, v))
    return rows


@given(impute_frames())
@SETTINGS
def test_impute_median_matches_pandas(spark, rows):
    """Median imputation equals the pandas groupby-median fill for any
    mix of null patterns, including all-null and empty groups."""
    from quantlab_data_pipeline_spark.operators.impute import impute_by_group

    schema = "g int, v double"
    df = (
        spark.createDataFrame(rows, schema)
        if rows else spark.createDataFrame([], schema)
    )
    got = sorted(
        (r["g"], r["v"])
        for r in impute_by_group(df, ["g"], {"v": "median"}, flag_suffix=None).collect()
    )
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    if len(pdf):
        med = pdf.groupby("g")["v"].transform("median")
        pdf["v"] = pdf["v"].fillna(med)
    want = sorted(
        (int(g), None if pd.isna(v) else float(v))
        for g, v in zip(pdf.get("g", []), pdf.get("v", []))
    )
    assert got == want


@given(st.integers(1, 200), st.sampled_from([4, 16, 64]))
@SETTINGS
def test_zorder_bucket_count_and_conservation(spark, n_rows, buckets):
    """with_zorder: every row gets a bucket in [0, buckets), row count
    is conserved, and the bucket is monotone in the z-value."""
    from quantlab_data_pipeline_spark.storage.layout import with_zorder

    df = spark.range(n_rows).selectExpr(
        "id as a", "cast(id * 37 % 101 as long) as b"
    )
    out = with_zorder(df, ["a", "b"], bits=8, buckets=buckets).collect()
    assert len(out) == n_rows
    assert all(0 <= r["zbucket"] < buckets for r in out)
    by_z = sorted(out, key=lambda r: r["zvalue"])
    zb = [r["zbucket"] for r in by_z]
    assert zb == sorted(zb)


@st.composite
def budget_corpora(draw):
    n = draw(st.integers(0, 14))
    rows = [
        (
            i,
            draw(st.sampled_from(["web", "code", "wiki"])),
            "w " * draw(st.integers(0, 8)),
        )
        for i in range(n)
    ]
    budget = draw(st.integers(0, 25))
    return rows, budget


@given(budget_corpora())
@SETTINGS
def test_token_budget_mix_matches_python_greedy(spark, case):
    """token_budget_mix == the python greedy fill under the md5 draw
    order, for random corpora including empty frames, zero budgets,
    and zero-token docs."""
    import hashlib

    from quantlab_data_pipeline_spark.llm.mixing import token_budget_mix

    rows, budget = case
    schema = "doc_id long, source string, text string"
    docs = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    got = {r["doc_id"]: r for r in token_budget_mix(docs, budget).collect()}

    draws = {
        i: int(hashlib.md5(f"budget{i}".encode()).hexdigest()[:8], 16) / 2**32
        for i, _, _ in rows
    }
    toks = {i: len(t.split()) for i, _, t in rows}
    assert set(got) == {i for i, _, _ in rows}
    for src in {"web", "code", "wiki"}:
        cum = 0
        for i in sorted(
            (i for i, s, _ in rows if s == src),
            key=lambda i: (draws[i], i),
        ):
            cum += toks[i]
            assert got[i]["cum_tokens"] == cum
            assert got[i]["kept"] == (cum <= budget)


@st.composite
def dsir_corpora(draw):
    words = st.sampled_from(["the", "cat", "dog", "xs9", "run", "q"])
    def doc(i):
        return (i, " ".join(draw(st.lists(words, min_size=0, max_size=6))))
    n_raw = draw(st.integers(1, 8))
    n_tgt = draw(st.integers(1, 4))
    return ([doc(i) for i in range(n_raw)],
            [doc(100 + i) for i in range(n_tgt)])


@given(dsir_corpora())
@SETTINGS
def test_dsir_scores_match_python(spark, case):
    """dsir_select's log-weights == the python replay (hashed buckets,
    add-one smoothing, integer nano-unit sums) on random tiny corpora —
    including docs with zero grams (must be absent)."""
    import hashlib
    import math
    import re as _re
    from collections import Counter

    from quantlab_data_pipeline_spark.llm.dsir import dsir_select

    raw_rows, tgt_rows = case
    B = 64
    schema = "doc_id long, text string"
    raw = spark.createDataFrame(raw_rows, schema)
    tgt = spark.createDataFrame(tgt_rows, schema)
    got = {
        r["doc_id"]: r
        for r in dsir_select(raw, tgt, buckets=B, k=1, salt="p").collect()
    }

    def grams(t):
        w = _re.findall(r"[a-z0-9]+", t.lower())
        return w + [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    def counts(rows):
        out = {}
        for i, t in rows:
            c = Counter(bucket(g) for g in grams(t))
            if c:
                out[i] = c
        return out

    def spark_round(x: float, scale: int) -> float:
        """Replay Spark's ``F.round``: HALF_UP on the double's SHORTEST
        decimal repr (BigDecimal.valueOf semantics). Python's built-in
        round() is HALF_EVEN on the exact binary value and disagrees on
        boundaries — hypothesis found -0.0588405, where Spark rounds to
        -0.058841 but round() gives -0.05884 (the binary double is just
        below the midpoint)."""
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1).scaleb(-scale)
        return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))

    rc, tc = counts(raw_rows), counts(tgt_rows)
    assert set(got) == set(rc)
    t_tot, r_tot = Counter(), Counter()
    for c in tc.values():
        t_tot.update(c)
    for c in rc.values():
        r_tot.update(c)
    tt, tr = sum(t_tot.values()), sum(r_tot.values())
    for i, c in rc.items():
        nano = sum(
            n
            * int(
                spark_round(
                    (
                        math.log((t_tot.get(b, 0) + 1.0) / (tt + B))
                        - math.log((r_tot.get(b, 0) + 1.0) / (tr + B))
                    )
                    * 1e9,
                    0,
                )
            )
            for b, n in c.items()
        )
        assert got[i]["log_w"] == spark_round(nano / 1e9, 6)
