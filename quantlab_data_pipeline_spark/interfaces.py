"""Abstract query interface (``DataHandler``).

API parity with ``/root/reference/src/data_pipeline/interfaces.py:13-101``:
nine abstract query methods; downstream code depends on this interface so
backends can be swapped. The Spark engine is exactly such a swapped
backend — methods return pandas DataFrames for drop-in compatibility,
while the concrete handler additionally exposes lazy ``*_df`` variants
returning Spark DataFrames.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Iterable
from pathlib import Path
from typing import Optional

import pandas as pd

DateLike = str
AssetLike = Iterable[str]


class DataHandler(ABC):
    """Abstract interface for unified data access.

    All downstream modules must depend on this API rather than reading
    files directly so backends can be swapped without refactors.
    """

    def __init__(self, data_root: Path):
        self.data_root = Path(data_root).expanduser().resolve()

    @abstractmethod
    def get_prices(
        self,
        tickers: AssetLike | None,
        start_date: DateLike | None = None,
        end_date: DateLike | None = None,
        fields: Optional[list[str]] = None,
    ) -> pd.DataFrame:
        """Daily prices filtered by tickers/date range/fields."""

    @abstractmethod
    def get_returns(
        self,
        tickers: AssetLike | None,
        start_date: DateLike | None = None,
        end_date: DateLike | None = None,
    ) -> pd.DataFrame:
        """Daily returns filtered by tickers/date range."""

    @abstractmethod
    def get_universe(self, date: DateLike | None = None) -> pd.DataFrame:
        """Universe membership; filtered to a single date if given."""

    @abstractmethod
    def get_fundamentals(
        self,
        tickers: AssetLike | None,
        start_date: DateLike | None = None,
        end_date: DateLike | None = None,
    ) -> pd.DataFrame:
        """Quarterly fundamentals panel."""

    @abstractmethod
    def get_analyst_consensus(
        self,
        tickers: AssetLike | None,
        start_date: DateLike | None = None,
        end_date: DateLike | None = None,
        fields: Optional[list[str]] = None,
    ) -> pd.DataFrame:
        """Analyst consensus recommendations (I/B/E/S 1-5 scale)."""

    @abstractmethod
    def get_analyst_ratings_history(
        self,
        tickers: AssetLike | None,
        start_date: DateLike | None = None,
        end_date: DateLike | None = None,
        fields: Optional[list[str]] = None,
    ) -> pd.DataFrame:
        """Analyst-level recommendation history (point-in-time)."""

    @abstractmethod
    def get_macro(
        self,
        start_date: DateLike | None = None,
        end_date: DateLike | None = None,
    ) -> pd.DataFrame:
        """Macro timeseries."""

    @abstractmethod
    def get_style_factor_returns(
        self,
        start_date: DateLike | None = None,
        end_date: DateLike | None = None,
    ) -> pd.DataFrame:
        """Style factor returns."""

    @abstractmethod
    def get_benchmark_returns(
        self,
        benchmark: str,
        start_date: DateLike | None = None,
        end_date: DateLike | None = None,
    ) -> pd.DataFrame:
        """Benchmark level/returns series."""
