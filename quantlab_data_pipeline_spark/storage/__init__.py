from .parquet import LocalParquetDataHandler

__all__ = ["LocalParquetDataHandler"]
