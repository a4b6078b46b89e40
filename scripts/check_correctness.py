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
        if sql is None:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
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
