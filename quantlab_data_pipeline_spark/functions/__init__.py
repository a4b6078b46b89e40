"""Scalar helpers (SURVEY §2.8) — all Catalyst expressions, zero UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_cusip(col: Column | str) -> Column:
    """CUSIP-8 normalization (reference wrds_ingestion.py:554-555):
    cast to string, strip non-alphanumerics, keep the first 8 chars."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.regexp_replace(c.cast("string"), "[^A-Za-z0-9]", ""), 1, 8)


def safe_double(col: Column | str) -> Column:
    """Numeric parse with reject (F4): non-numeric -> null (matches the
    reference's try/float skip of FRED '.' observations). ``try_cast``
    because a plain cast throws under ANSI mode."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


__all__ = ["normalize_cusip", "safe_double"]
