"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference QuantLab data pipeline.

Public import surface mirrors the reference's
(``/root/reference/src/data_pipeline/__init__.py:1-17``) so downstream
code can swap backends without refactors.
"""

from .config import (
    DEFAULT_END,
    DEFAULT_START,
    default_data_root,
    load_config,
    resolve_data_root,
)
from .interfaces import AssetLike, DataHandler, DateLike
from .session import get_spark
from .storage.parquet import LocalParquetDataHandler

__all__ = [
    "AssetLike",
    "DataHandler",
    "DateLike",
    "DEFAULT_END",
    "DEFAULT_START",
    "LocalParquetDataHandler",
    "default_data_root",
    "get_spark",
    "ingest",
    "load_config",
    "resolve_data_root",
]


def ingest(*args, **kwargs):
    """Batch ETL entry point (lazy import to keep base import light)."""
    from .ingestion.pipeline import ingest as _ingest

    return _ingest(*args, **kwargs)
