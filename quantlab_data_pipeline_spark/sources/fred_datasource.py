"""FRED as a Spark 4 Python Data Source (``pyspark.sql.datasource``).

:mod:`.fred` fetches driver-side and ``createDataFrame``s the rows —
right for three tiny series. This module is the same source exposed
through the engine-native V2 surface instead: ``spark.read.format
("fred")`` with one :class:`InputPartition` PER SERIES, so a caller
pulling hundreds of series gets the fetches fanned out across
executors, retried per-task, and unioned by the engine — no driver
loop. The numeric-reject semantics (FRED emits ``"."`` for missing
observations; SURVEY §2 F4) are applied in the partition reader, and
the equivalence test pins them to the driver-side path's ``try_cast``.

Usage::

    spark.dataSource.register(FredDataSource)
    df = (spark.read.format("fred")
          .option("series", "CPIAUCSL,UNRATE")
          .option("start", "2020-01-01").option("end", "2020-12-31")
          .option("mode", "synthetic")      # or "http" (network + key)
          .load())
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .fred import DEFAULT_SERIES, http_fred_fetcher, synthetic_fred_fetcher

_SCHEMA = "date date, series_name string, value double"


class _SeriesPartition(InputPartition):
    def __init__(self, series_id: str):
        self.series_id = series_id


class FredDataSource(DataSource):
    """``format("fred")`` — options: ``series`` (csv, default the
    reference's three), ``start``/``end`` (YYYY-MM-DD, required),
    ``mode`` (``synthetic`` default — offline deterministic — or
    ``http``), ``api_key``, ``seed``."""

    @classmethod
    def name(cls) -> str:
        return "fred"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "FredReader":  # noqa: ANN001 — API contract
        return FredReader(self.options)


class FredReader(DataSourceReader):
    def __init__(self, options: dict):
        self.series: Sequence[str] = [
            s.strip()
            for s in options.get("series", ",".join(DEFAULT_SERIES)).split(",")
            if s.strip()
        ]
        self.start = options.get("start")
        self.end = options.get("end")
        if not self.start or not self.end:
            raise ValueError("fred source requires 'start' and 'end' options")
        self.mode = options.get("mode", "synthetic")
        if self.mode not in {"synthetic", "http"}:
            raise ValueError(f"mode must be synthetic|http, got {self.mode!r}")
        self.api_key = options.get("api_key")
        self.seed = int(options.get("seed", "7"))

    def partitions(self) -> list[InputPartition]:
        return [_SeriesPartition(s) for s in self.series]

    def read(self, partition: _SeriesPartition) -> Iterator[tuple]:
        # Runs on the executor: build the fetcher locally (callables
        # must not ride in from the driver — options are plain strings).
        if self.mode == "synthetic":
            fetch = synthetic_fred_fetcher(self.seed)
        else:
            fetch = http_fred_fetcher(self.api_key)
        for obs in fetch(partition.series_id, self.start, self.end):
            raw = obs.get("value")
            try:
                value = float(raw)  # "." and malformed -> rejected
            except (TypeError, ValueError):
                continue
            date = dt.date.fromisoformat(obs.get("date"))
            yield (date, partition.series_id, value)
