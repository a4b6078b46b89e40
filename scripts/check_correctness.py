#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given scale factor
and compares against ``oracle_sql()`` via DuckDB: row count, column set,
and order-insensitive values. Reports exact-match and max numeric
deviation per query so float-sensitivity is visible before the driver
sees it.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _pagerank_suppliers_python_oracle(con: "duckdb.DuckDBPyConnection") -> pd.DataFrame:
    """Iterative power-iteration oracle for pagerank_suppliers.

    The registry's SQL oracle unrolls the 10 iterations into a CTE
    chain, which DuckDB materializes all at once — at sf0.1 the
    co-part graph is dense enough that the unrolled chain exhausts
    local disk (VERDICT r2 item 4). Same update rule, same graph
    construction SQL, but the loop runs driver-side in numpy where 10
    iterations over a vector is trivial at any sf this harness sees.
    """
    edges = con.execute(
        """
        WITH ps AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ), e0 AS (
            SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
            FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
                               AND a.l_suppkey < b.l_suppkey
        )
        SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
        """
    ).fetchdf()
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    nodes = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(nodes, src)
    t = np.searchsorted(nodes, dst)
    n = len(nodes)
    deg = np.bincount(s, minlength=n).astype(float)
    d = 0.85
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        mass = np.bincount(t, weights=r[s] / deg[s], minlength=n)
        dangling = r[deg == 0].sum()  # identically 0 on this graph
        r = (1.0 - d) / n + d * (mass + dangling / n)
    return pd.DataFrame(
        {"suppkey": nodes.astype("int64"), "rank": np.round(r, 8)}
    )


# Queries whose SQL oracle is valid but too expensive for DuckDB at the
# 10x cross-scale run: the local mirror swaps in an equivalent
# driver-side iterative oracle (the driver itself still runs the SQL
# oracle at sf0.01, where it is fine).
PYTHON_ORACLES = {
    "pagerank_suppliers": _pagerank_suppliers_python_oracle,
}


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = pd.to_datetime(col).dt.tz_localize(None)
        elif col.dtype == object:
            # dates / lists arrive as objects; stringify for ordering
            df[c] = col.astype(str)
        elif pd.api.types.is_bool_dtype(col):
            df[c] = col.astype(bool)
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if problems:
        return problems
    a, b = _canon(spark_df), _canon(oracle_df)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            diff = np.abs(av - bv)
            diff[both_nan] = 0.0
            scale = np.maximum(np.abs(bv), 1.0)
            rel = np.nanmax(diff / scale) if len(diff) else 0.0
            if rel > 1e-9:
                problems.append(f"col {c}: max rel diff {rel:.3e}")
            elif rel > 0:
                problems.append(f"WARN col {c}: nonzero rel diff {rel:.3e} (exact-hash risk)")
        else:
            eq = (a[c].astype(str) == b[c].astype(str)) | (a[c].isna() & b[c].isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"col {c}: mismatch at row {i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from quantlab_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    # big-sf oracle runs (self-joins, recursive CTEs) spill tens of GB;
    # keep that out of the repo working tree
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failed, warned = [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"[FAIL] {name}: spark error: {exc}")
            continue
        sql = oracles.get(name)
        if name in PYTHON_ORACLES:
            try:
                odf = PYTHON_ORACLES[name](con)
            except Exception as exc:  # noqa: BLE001
                failed.append(name)
                print(f"[FAIL] {name}: python oracle error: {exc}")
                continue
        elif sql is None:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        else:
            try:
                odf = con.execute(sql).fetchdf()
            except Exception as exc:  # noqa: BLE001
                failed.append(name)
                print(f"[FAIL] {name}: oracle error: {exc}")
                continue
        problems = compare(name, sdf, odf)
        hard = [p for p in problems if not p.startswith("WARN")]
        if hard:
            failed.append(name)
            print(f"[FAIL] {name}: " + "; ".join(problems))
        elif problems:
            warned.append(name)
            print(f"[WARN] {name}: " + "; ".join(problems))
        else:
            print(f"[ok]   {name}: {len(sdf)} rows")
    print(
        f"\n{len(queries) - len(failed)}/{len(queries)} ok"
        + (f", warned: {warned}" if warned else "")
        + (f", FAILED: {failed}" if failed else "")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
