from .layout import with_zorder, zorder_stats, zvalue_column
from .parquet import LocalParquetDataHandler

__all__ = [
    "LocalParquetDataHandler",
    "with_zorder",
    "zorder_stats",
    "zvalue_column",
]
