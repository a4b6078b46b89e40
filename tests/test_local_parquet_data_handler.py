"""Handler query tests — ported from the reference suite
(/root/reference/tests/test_local_parquet_data_handler.py:131-198),
asserting identical filter/projection/error semantics on the Spark
backend.
"""

from __future__ import annotations

import pandas as pd
import pytest

from quantlab_data_pipeline_spark import LocalParquetDataHandler


@pytest.fixture(scope="module")
def handler(fixture_root, spark):
    return LocalParquetDataHandler(fixture_root, spark=spark)


def test_get_prices_filters(handler):
    out = handler.get_prices(
        ["AAA"], start_date="2020-01-02", end_date="2020-01-04",
        fields=["close", "volume"],
    )
    assert set(out.columns) == {"date", "asset_id", "ticker", "close", "volume"}
    assert out["ticker"].unique().tolist() == ["AAA"]
    assert out["date"].min() >= pd.Timestamp("2020-01-02")
    assert out["date"].max() <= pd.Timestamp("2020-01-04")
    assert len(out) == 3
    assert out["close"].tolist() == [11.0, 12.0, 13.0]


def test_get_returns(handler):
    out = handler.get_returns(["BBB"], end_date="2020-01-03")
    assert out["asset_id"].unique().tolist() == [2]
    assert out["date"].max() <= pd.Timestamp("2020-01-03")
    # pct_change oracle: 21/20-1, 22/21-1
    assert out["ret_1d"].tolist() == pytest.approx([0.05, 22 / 21 - 1])


def test_get_universe(handler):
    out = handler.get_universe(date="2020-01-03")
    assert out["date"].unique().tolist() == [pd.Timestamp("2020-01-03")]
    assert sorted(out["asset_id"].tolist()) == [1, 2]
    assert out["in_universe"].all()


def test_get_fundamentals(handler):
    out = handler.get_fundamentals(["AAA"], start_date="2020-01-01", end_date="2020-06-30")
    assert len(out) == 1
    assert {"report_date", "asset_id", "net_income", "total_assets"} <= set(out.columns)
    assert out["net_income"].iloc[0] == 10.0


def test_get_macro_and_factors(handler):
    macro = handler.get_macro(start_date="2020-01-02")
    assert not macro.empty
    assert macro["series_name"].unique().tolist() == ["CPI"]
    factors = handler.get_style_factor_returns()
    assert not factors.empty
    assert factors["factor_name"].unique().tolist() == ["MKT"]


def test_get_benchmark(handler):
    out = handler.get_benchmark_returns("^GSPC", start_date="2020-01-02")
    assert not out.empty
    assert (out["benchmark_name"] == "^GSPC").all()
    assert out["date"].min() >= pd.Timestamp("2020-01-02")


def test_get_analyst_consensus(handler):
    out = handler.get_analyst_consensus(
        ["AAA"], end_date="2020-01-02", fields=["mean_rating", "num_analysts"]
    )
    assert set(out.columns) == {"date", "asset_id", "ticker", "mean_rating", "num_analysts"}
    assert len(out) == 1
    assert out["mean_rating"].iloc[0] == 1.5


def test_get_analyst_ratings_history(handler):
    out = handler.get_analyst_ratings_history(["BBB"], end_date="2020-01-04")
    assert len(out) == 1
    assert out["analyst_id"].iloc[0] == 200
    assert out["action_code"].iloc[0] == "DOWN"


def test_unknown_ticker_raises(handler):
    with pytest.raises(ValueError, match="ZZZ"):
        handler.get_prices(["ZZZ"])


def test_missing_field_raises(handler):
    with pytest.raises(ValueError, match="missing"):
        handler.get_prices(["AAA"], fields=["nonexistent_col"])


def test_missing_dataset_raises(tmp_path, spark):
    h = LocalParquetDataHandler(tmp_path, spark=spark)
    with pytest.raises(FileNotFoundError):
        h.get_macro()


def test_field_map_yaml_reload(fixture_root, spark, tmp_path):
    """The handler reloads the field-map YAML at construction (like the
    reference), so an edited mapping re-renames columns at read time —
    files written by other tools included."""
    custom = tmp_path / "field_map.yml"
    custom.write_text("fundamentals:\n  net_income: bottomline\n")
    h = LocalParquetDataHandler(fixture_root, spark=spark, field_map_path=custom)
    out = h.get_fundamentals(["AAA"], start_date="2020-01-01", end_date="2020-06-30")
    assert "bottomline" in out.columns
    assert "net_income" not in out.columns
    # default construction uses the shipped YAML, identical to FIELD_MAP
    default = LocalParquetDataHandler(fixture_root, spark=spark)
    from quantlab_data_pipeline_spark.schemas import FIELD_MAP
    assert default._field_map == FIELD_MAP
