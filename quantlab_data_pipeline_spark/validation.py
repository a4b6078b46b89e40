"""Post-ingest data-quality validation.

The reference trusts its outputs (no checks anywhere); a pipeline
feeding a 100 TB research stack cannot. ``validate_outputs`` audits
every canonical dataset in ONE Spark job per table — each check is an
aggregate expression, so the table is scanned once no matter how many
checks run:

- primary-key uniqueness (keys from the implied-key catalog, SURVEY §1.4)
- non-null key columns
- date bounds inside the ingest window
- domain checks (returns > -1, non-negative volume/shrout, bool flags)

Returns a list of failure dicts (empty = clean); ``raise_on_failure``
turns them into one ValidationError for pipeline gating.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import META_TABLES, SCHEMAS

# Implied primary key per dataset (SURVEY §1.4 table).
PRIMARY_KEYS: dict[str, list[str]] = {
    "prices_daily": ["date", "asset_id"],
    "returns_daily": ["date", "asset_id"],
    "returns_monthly": ["date", "asset_id"],
    "fundamentals_quarterly": ["report_date", "asset_id"],
    "analyst_consensus": ["date", "asset_id"],
    "analyst_ratings_history": ["date", "asset_id", "analyst_id"],
    "macro_timeseries": ["date", "series_name"],
    "style_factor_returns": ["date", "factor_name"],
    "risk_free": ["date"],
    "benchmarks": ["date", "benchmark_name"],
    "sp500_membership": ["date", "asset_id"],
    "dividends_monthly": ["asset_id", "date"],
    "assets_master": ["asset_id"],
    "universe_sp500": ["date", "asset_id"],
    "trading_calendar": ["date"],
}

# (table, column) -> lower bound is exclusive -1 (a return of -100% is
# a data error in CRSP-shaped data; delist-adjusted can touch -1 only
# when dlret=-1, which the synthetic source never emits).
_RET_COLS = {
    "prices_daily": ["ret"],
    "returns_daily": ["ret_1d"],
    "returns_monthly": ["ret", "ret_1m"],
    "benchmarks": ["ret"],
}
_NON_NEGATIVE = {
    "prices_daily": ["volume", "shrout"],
    "returns_monthly": ["volume", "shrout"],
}


class ValidationError(RuntimeError):
    pass


def _date_col(table: str) -> str | None:
    names = SCHEMAS[table].names
    return "report_date" if "report_date" in names else (
        "date" if "date" in names else None
    )


def validate_table(
    df: DataFrame,
    table: str,
    start: str | None = None,
    end: str | None = None,
) -> list[dict]:
    """All checks for one table in a single aggregate pass."""
    keys = PRIMARY_KEYS.get(table, [])
    aggs = [F.count(F.lit(1)).alias("__rows")]
    if keys:
        aggs.append(F.count_distinct(*[F.col(k) for k in keys]).alias("__distinct_keys"))
        for k in keys:
            aggs.append(F.sum(F.col(k).isNull().cast("long")).alias(f"__null_{k}"))
    dcol = _date_col(table)
    if dcol and start:
        aggs.append(
            F.sum((F.col(dcol) < F.lit(start).cast("date")).cast("long")).alias("__before")
        )
    if dcol and end:
        aggs.append(
            F.sum((F.col(dcol) > F.lit(end).cast("date")).cast("long")).alias("__after")
        )
    for c in _RET_COLS.get(table, []):
        aggs.append(F.sum((F.col(c) <= -1.0).cast("long")).alias(f"__badret_{c}"))
    for c in _NON_NEGATIVE.get(table, []):
        aggs.append(F.sum((F.col(c) < 0).cast("long")).alias(f"__neg_{c}"))

    row = df.agg(*aggs).collect()[0].asDict()
    failures: list[dict] = []

    def fail(check: str, detail: str) -> None:
        failures.append({"table": table, "check": check, "detail": detail})

    if row["__rows"] == 0:
        fail("non_empty", "table has 0 rows")
        return failures
    if keys and row["__distinct_keys"] != row["__rows"]:
        fail(
            "unique_key",
            f"{row['__rows'] - row['__distinct_keys']} duplicate rows on {keys}",
        )
    for k in keys:
        if row.get(f"__null_{k}", 0):
            fail("non_null_key", f"{row[f'__null_{k}']} null values in key column {k}")
    if row.get("__before"):
        fail("date_window", f"{row['__before']} rows before {start}")
    if row.get("__after"):
        fail("date_window", f"{row['__after']} rows after {end}")
    for c in _RET_COLS.get(table, []):
        if row.get(f"__badret_{c}"):
            fail("return_domain", f"{row[f'__badret_{c}']} rows with {c} <= -1")
    for c in _NON_NEGATIVE.get(table, []):
        if row.get(f"__neg_{c}"):
            fail("non_negative", f"{row[f'__neg_{c}']} rows with negative {c}")
    return failures


def validate_outputs(
    root: Path | str,
    spark: SparkSession,
    start: str | None = None,
    end: str | None = None,
    raise_on_failure: bool = False,
) -> list[dict]:
    """Validate every canonical dataset under an ingest root."""
    root = Path(root)
    failures: list[dict] = []
    for table in SCHEMAS:
        sub = "data_meta" if table in META_TABLES else "data_processed"
        path = root / sub / f"{table}.parquet"
        if not path.exists():
            failures.append(
                {"table": table, "check": "exists", "detail": f"missing {path}"}
            )
            continue
        df = spark.read.parquet(str(path))
        failures.extend(validate_table(df, table, start=start, end=end))
    if failures and raise_on_failure:
        lines = "; ".join(f"{f['table']}.{f['check']}: {f['detail']}" for f in failures)
        raise ValidationError(lines)
    return failures
