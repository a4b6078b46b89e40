"""Source-adapter tests that run without a WRDS server: the JDBC
reader's pushdown SQL and membership-filter strategy, and the FRED
fetcher's parse-with-reject semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.sources.fred import fetch_macro, synthetic_fred_fetcher
from quantlab_data_pipeline_spark.sources.wrds import (
    JdbcWrdsSource,
    SyntheticWrdsSource,
    _semi_filter,
)


def test_semi_filter_small_list_is_in_predicate(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    out = _semi_filter(df, "k", [3, 5, 7])
    assert sorted(r["k"] for r in out.collect()) == [3, 5, 7]
    # small lists stay a Filter (no join node in the plan)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_semi_filter_large_list_is_semi_join(spark):
    df = spark.range(5000).withColumnRenamed("id", "k")
    wanted = list(range(0, 4000, 2))  # 2000 values > threshold
    out = _semi_filter(df, "k", wanted)
    assert out.count() == len(wanted)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan


def test_jdbc_queries_push_predicates_serverside(spark):
    """No live server needed: the reader's SQL must carry the date
    predicates (the reference pushes them in every query) and never
    string-splice id lists (its _sql_list injection hazard)."""
    captured = []

    class Probe(JdbcWrdsSource):
        def _read(self, query, partition_on_date=None):
            captured.append((query, partition_on_date))
            # return an empty frame of plausible shape for chaining
            return spark.createDataFrame([], "permno long, asset_id long, "
                                             "ticker string, gvkey string, date date")

    src = Probe(spark)
    src.daily_prices([1, 2], "2020-01-01", "2020-12-31")
    src.fundamentals(["001"], "2020-01-01", "2020-12-31")
    src.sp500_universe("2020-01-01", "2020-12-31")

    prices_q, prices_part = captured[0]
    assert "between '2020-01-01' and '2020-12-31'" in prices_q
    assert prices_part == ("2020-01-01", "2020-12-31")  # parallel date read
    assert "in (" not in prices_q.lower()  # membership is Spark-side

    funda_q, _ = captured[1]
    assert "indfmt='INDL'" in funda_q and "between" in funda_q

    uni_q, _ = captured[2]
    assert "crsp.dsp500list" in uni_q


def test_synthetic_source_is_deterministic(spark):
    a = SyntheticWrdsSource(spark, n_assets=4, seed=7)
    b = SyntheticWrdsSource(spark, n_assets=4, seed=7)
    pa = a.daily_prices(a._permnos(), "2020-01-01", "2020-02-28").toPandas()
    pb = b.daily_prices(b._permnos(), "2020-01-01", "2020-02-28").toPandas()
    assert pa.equals(pb)
    c = SyntheticWrdsSource(spark, n_assets=4, seed=8)
    pc = c.daily_prices(c._permnos(), "2020-01-01", "2020-02-28").toPandas()
    assert not pa["ret"].equals(pc["ret"])


def test_fred_fetch_rejects_non_numeric(spark):
    fetched = synthetic_fred_fetcher()("CPIAUCSL", "2020-01-01", "2020-12-31")
    assert any(o["value"] == "." for o in fetched)  # generator emits markers
    df = fetch_macro(spark, "2020-01-01", "2020-12-31",
                     series=["CPIAUCSL"], fetcher=synthetic_fred_fetcher())
    out = df.toPandas()
    assert len(out) == sum(1 for o in fetched if o["value"] != ".")
    assert out["value"].notna().all()


def test_fred_fetch_empty_series(spark):
    df = fetch_macro(spark, "2020-01-01", "2020-12-31", series=[],
                     fetcher=synthetic_fred_fetcher())
    assert df.count() == 0
    assert df.columns == ["date", "series_name", "value"]
