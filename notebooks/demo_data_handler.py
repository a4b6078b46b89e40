"""Quick demo script to validate the LocalParquetDataHandler — the
Spark-backed twin of the reference's consumer demo
(``/root/reference/notebooks/demo_data_handler.py``): the import
surface and call shapes are identical, so this is what "switching
backends without refactors" looks like in practice.

Run after ingesting data, e.g. the offline synthetic ingest:
    python -m quantlab_data_pipeline_spark.ingestion.pipeline \
        --synthetic --root /tmp/qlroot --start 2020-01-01 --end 2020-06-30
    QUANTLAB_DATA_ROOT=/tmp/qlroot python notebooks/demo_data_handler.py
"""

from quantlab_data_pipeline_spark import LocalParquetDataHandler, default_data_root


def main() -> None:
    handler = LocalParquetDataHandler(default_data_root())

    print("Universe on 2020-03-02:")
    print(handler.get_universe("2020-03-02").head())

    print("\nPrices: ALPH, BRVO from 2020-02-01 to 2020-04-01:")
    print(handler.get_prices(["ALPH", "BRVO"], "2020-02-01", "2020-04-01").head())

    print("\nReturns: ALPH, BRVO from 2020-02-01 to 2020-04-01:")
    print(handler.get_returns(["ALPH", "BRVO"], "2020-02-01", "2020-04-01").head())

    print("\nStyle factors:")
    print(handler.get_style_factor_returns().head())

    print("\nBenchmark ^GSPC level:")
    print(handler.get_benchmark_returns("^GSPC").head())


if __name__ == "__main__":
    main()
