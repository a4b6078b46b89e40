from __future__ import annotations

import pandas as pd
import pytest

from quantlab_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Test-session sizing (suite-budget fix, round 10): the engine
    # default master is local[$SPARK_GRAFT_CPUS] with the AQE
    # pre-coalesce reducer count at 8x cores — right for the bench's
    # data volumes, pure scheduling overhead on this suite's tiny
    # frames (460+ tests x hundreds of actions). local[8] with 8
    # initial partitions keeps every code path multi-partition (shuffles,
    # AQE coalescing, bucketed joins all still exercised) while cutting
    # the measured suite wall ~40%. Semantics under test are
    # partitioning-independent by design — the one partition-count
    # assertion in the suite pins a custom data source's planInputs,
    # not the session's parallelism.
    s = get_spark(
        app_name="quantlab-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "8",
        },
    )
    yield s


def _dates(n=5, start="2020-01-01"):
    return list(pd.date_range(start, periods=n, freq="D"))


def write_parquet_us(df: pd.DataFrame, path) -> None:
    """Write pandas->parquet with microsecond timestamps (Spark-readable:
    pandas defaults to TIMESTAMP(NANOS), which Spark rejects)."""
    df.to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )


@pytest.fixture(scope="session")
def fixture_root(tmp_path_factory):
    """Miniature 11-table parquet fixture, modeled on the reference suite
    (/root/reference/tests/test_local_parquet_data_handler.py:15-128):
    2 assets (AAA=1, BBB=2) over 5 days 2020-01-01..05.
    """
    root = tmp_path_factory.mktemp("quantlab_data_pipeline")
    processed = root / "data_processed"
    meta = root / "data_meta"
    processed.mkdir()
    meta.mkdir()
    days = _dates()

    write_parquet_us(
        pd.DataFrame(
            {
                "asset_id": [1, 2],
                "ticker": ["AAA", "BBB"],
                "sector": ["Tech", "Fin"],
                "industry": ["Software", "Banks"],
                "currency": ["USD", "USD"],
                "first_date": [days[0]] * 2,
                "last_date": [days[-1]] * 2,
            }
        ),
        meta / "assets_master.parquet",
    )

    write_parquet_us(
        pd.DataFrame({"date": days, "is_trading_day": True}),
        meta / "trading_calendar.parquet",
    )

    write_parquet_us(
        pd.DataFrame(
            {
                "date": days * 2,
                "asset_id": [1] * 5 + [2] * 5,
                "in_universe": [True] * 10,
            }
        ),
        meta / "universe_sp500.parquet",
    )

    prices = pd.DataFrame(
        {
            "date": days * 2,
            "asset_id": [1] * 5 + [2] * 5,
            "ticker": ["AAA"] * 5 + ["BBB"] * 5,
            "open": [10.0, 11, 12, 13, 14, 20, 21, 22, 23, 24],
            "high": [11.0, 12, 13, 14, 15, 21, 22, 23, 24, 25],
            "low": [9.0, 10, 11, 12, 13, 19, 20, 21, 22, 23],
            "close": [10.0, 11, 12, 13, 14, 20, 21, 22, 23, 24],
            "adj_close": [10.0, 11, 12, 13, 14, 20, 21, 22, 23, 24],
            "volume": [1e6] * 10,
        }
    )
    write_parquet_us(prices, processed / "prices_daily.parquet")

    returns = prices[["date", "asset_id", "ticker", "adj_close"]].copy()
    returns["ret_1d"] = returns.groupby("ticker")["adj_close"].pct_change()
    returns = returns.dropna(subset=["ret_1d"]).drop(columns=["adj_close"])
    write_parquet_us(returns, processed / "returns_daily.parquet")

    write_parquet_us(
        pd.DataFrame(
            {
                "date": days * 2,
                "asset_id": [1] * 5 + [2] * 5,
                "in_sp500": [True] * 10,
            }
        ),
        processed / "sp500_membership.parquet",
    )

    write_parquet_us(
        pd.DataFrame(
            {
                "report_date": [pd.Timestamp("2020-03-31")] * 2,
                "asset_id": [1, 2],
                "book_value": [100.0, 200.0],
                "net_income": [10.0, 20.0],
                "total_assets": [500.0, 600.0],
                "total_debt": [200.0, 250.0],
                "cfo": [12.0, 22.0],
            }
        ),
        processed / "fundamentals_quarterly.parquet",
    )

    write_parquet_us(
        pd.DataFrame(
            {"date": days, "series_name": ["CPI"] * 5, "value": [0.0, 1, 2, 3, 4]}
        ),
        processed / "macro_timeseries.parquet",
    )

    write_parquet_us(
        pd.DataFrame({"date": days, "factor_name": ["MKT"] * 5, "ret": [0.001] * 5}),
        processed / "style_factor_returns.parquet",
    )

    write_parquet_us(
        pd.DataFrame(
            {
                "date": days,
                "benchmark_name": ["^GSPC"] * 5,
                "level": [100.0, 101, 102, 103, 104],
                "ret": [0.001] * 5,
            }
        ),
        processed / "benchmarks.parquet",
    )

    write_parquet_us(
        pd.DataFrame({"date": days, "rf": [0.0001] * 5}),
        processed / "risk_free.parquet",
    )

    write_parquet_us(
        pd.DataFrame(
            {
                "date": [days[1], days[2]],
                "asset_id": [1, 2],
                "ticker": ["AAA", "BBB"],
                "mean_rating": [1.5, 3.2],
                "median_rating": [1.0, 3.0],
                "stdev_rating": [0.2, 0.5],
                "num_analysts": [5, 6],
                "rating_high": [1.0, 2.0],
                "rating_low": [2.0, 4.0],
                "num_buy": [3, 1],
                "num_hold": [2, 3],
                "num_sell": [0, 2],
            }
        ),
        processed / "analyst_consensus.parquet",
    )

    write_parquet_us(
        pd.DataFrame(
            {
                "date": [days[1], days[3]],
                "asset_id": [1, 2],
                "ticker": ["AAA", "BBB"],
                "analyst_id": [100, 200],
                "rating": [1.0, 3.0],
                "action_code": ["INIT", "DOWN"],
                "rating_text": ["Strong Buy", "Hold"],
                "statistic_date": [days[1], days[3]],
            }
        ),
        processed / "analyst_ratings_history.parquet",
    )

    return root
