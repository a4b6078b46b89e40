"""Fixed schema registry for every canonical dataset.

The reference infers schemas on read (pandas); here every table gets an
explicit ``StructType`` so Parquet scans are schema'd, pruned, and never
re-inferred. Column lists follow the reference's output catalog
(``/root/reference/src/data_pipeline/ingestion/wrds_ingestion.py:1135-1153``
and ``reference/field_manifest.csv``). All columns nullable, matching the
reference's tolerance for missing fields.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Open-ended interval sentinel (the reference uses pd.Timestamp.max, whose
# nanosecond value can overflow Arrow/Spark conversion — use a far date).
OPEN_END_DATE = "9999-12-31"


def _struct(cols: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(name, dtype, True) for name, dtype in cols])


_D = T.DateType()
_S = T.StringType()
_L = T.LongType()
_F = T.DoubleType()
_B = T.BooleanType()

SCHEMAS: dict[str, T.StructType] = {
    "prices_daily": _struct([
        ("date", _D), ("asset_id", _L), ("open", _F), ("high", _F),
        ("low", _F), ("close", _F), ("cfacpr", _F), ("ret", _F),
        ("shrout", _F), ("volume", _F), ("adj_close", _F), ("ticker", _S),
    ]),
    "returns_daily": _struct([
        ("date", _D), ("asset_id", _L), ("ticker", _S), ("ret_1d", _F),
    ]),
    "returns_monthly": _struct([
        ("date", _D), ("asset_id", _L), ("ret", _F), ("price", _F),
        ("volume", _F), ("shrout", _F), ("ret_1m", _F),
    ]),
    "fundamentals_quarterly": _struct([
        ("report_date", _D), ("asset_id", _L), ("revenue", _F), ("sales", _F),
        ("net_income", _F), ("total_assets", _F), ("common_equity", _F),
        ("total_debt_long_term", _F), ("preferred_stock", _F),
        ("cash_flow_from_operations", _F), ("capital_expenditures", _F),
        ("research_and_development", _F),
    ]),
    "analyst_consensus": _struct([
        ("date", _D), ("asset_id", _L), ("ticker", _S), ("mean_rating", _F),
        ("median_rating", _F), ("stdev_rating", _F), ("num_analysts", _L),
        ("buy_percent", _F), ("hold_percent", _F), ("sell_percent", _F),
        ("num_up", _L), ("num_down", _L), ("usfirm", _L),
        ("ibes_official_ticker", _S), ("ibes_cusip", _S), ("company_name", _S),
    ]),
    "analyst_ratings_history": _struct([
        ("date", _D), ("asset_id", _L), ("ticker", _S), ("analyst_id", _L),
        ("rating", _F), ("action_code", _S), ("rating_text", _S),
        ("statistic_date", _D),
    ]),
    "macro_timeseries": _struct([
        ("date", _D), ("series_name", _S), ("value", _F),
    ]),
    "style_factor_returns": _struct([
        ("date", _D), ("factor_name", _S), ("ret", _F),
    ]),
    "risk_free": _struct([("date", _D), ("rf", _F)]),
    "benchmarks": _struct([
        ("date", _D), ("benchmark_name", _S), ("level", _F), ("ret", _F),
    ]),
    "sp500_membership": _struct([
        ("date", _D), ("asset_id", _L), ("in_sp500", _B),
    ]),
    "dividends_monthly": _struct([
        ("asset_id", _L), ("distcd", _S), ("divamt", _F), ("facpr", _F),
        ("facshr", _F), ("date", _D), ("close", _F), ("dividend_yield", _F),
    ]),
    "assets_master": _struct([
        ("asset_id", _L), ("ticker", _S), ("first_date", _D),
        ("last_date", _D), ("ipodate", _D),
    ]),
    "universe_sp500": _struct([
        ("date", _D), ("asset_id", _L), ("in_universe", _B),
    ]),
    "trading_calendar": _struct([("date", _D), ("is_trading_day", _B)]),
}

# Which directory each dataset lives under, mirroring the reference layout.
META_TABLES = frozenset({"assets_master", "universe_sp500", "trading_calendar"})

# WRDS mnemonic -> friendly-name map (reference config/wrds_field_map.yml).
FIELD_MAP: dict[str, dict[str, str]] = {
    "fundamentals": {
        "revt": "revenue",
        "ni": "net_income",
        "at": "total_assets",
        "ceq": "common_equity",
        "dltt": "total_debt_long_term",
        "oancf": "cash_flow_from_operations",
        "capx": "capital_expenditures",
        "pstk": "preferred_stock",
        "xrd": "research_and_development",
        "sale": "sales",
    }
}


def schema_for(table: str) -> T.StructType:
    try:
        return SCHEMAS[table]
    except KeyError:
        raise KeyError(f"No registered schema for table {table!r}") from None
