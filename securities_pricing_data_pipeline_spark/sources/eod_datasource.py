"""S1 as a first-class Spark 4 Python Data Source: ``spark.read
.format("eod_bars")`` / ``spark.readStream.format("eod_bars")``.

Where ``eod_api.backfill_source`` distributes the fetch by hand over
``mapInPandas``, this wraps the same per-day fetch in the
``pyspark.sql.datasource`` API so Catalyst owns planning: one
``InputPartition`` per trading date (fetches run on executors, scale with
the cluster, retry per-task on failure), schema declared up front, and
the identical source usable from both batch and Structured Streaming
(daily-poll micro-batches via ``SimpleDataSourceStreamReader``).

Reference parity: the fetch window + projection mirror
``dags/lib/eod_data_downloader.py:24-61``; no endpoints or secrets are
baked in. ``mode=synthetic`` (default) generates a deterministic offline
corpus shaped like the API response — the only mode exercisable in this
container; ``mode=http`` wires ``eod_api.http_fetcher`` per partition.

Scale note: partition-per-date is the right granularity for a grouped-
daily endpoint (one request per date regardless of cluster size); a
1000-day backfill fans out to 1000 independent tasks with no driver
bottleneck and no shuffle.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,  # noqa: F401  (re-export for discoverability)
    InputPartition,
    SimpleDataSourceStreamReader,
)

from securities_pricing_data_pipeline_spark.schemas import EOD_CSV_SCHEMA


def synthetic_day(day: dt.date, n_symbols: int) -> list[dict]:
    """Deterministic API-shaped rows for one date (keys T,o,h,l,c,v)."""
    if day.weekday() >= 5:  # market closed — exercises lookback handling
        return []
    base = day.toordinal()
    rows = []
    for i in range(n_symbols):
        o = Decimal((base * 31 + i * 17) % 9000 + 1000) / 100
        c = Decimal((base * 37 + i * 23) % 9000 + 1000) / 100
        rows.append(
            {
                "T": f"SYN{i:04d}",
                "o": o,
                "h": max(o, c) + 1,
                "l": min(o, c) - 1,
                "c": c,
                "v": (base * 13 + i * 7) % 1_000_000 + 100,
            }
        )
    return rows


def _project(day: dt.date, rows: list[dict]):
    """S2 projection: T,o,h,l,c,v → typed bar tuple; missing keys → NULL."""
    for r in rows:
        yield (
            day,
            r.get("T"),
            None if r.get("o") is None else Decimal(str(r["o"])),
            None if r.get("h") is None else Decimal(str(r["h"])),
            None if r.get("l") is None else Decimal(str(r["l"])),
            None if r.get("c") is None else Decimal(str(r["c"])),
            None if r.get("v") is None else Decimal(int(r["v"])),
        )


def _fetcher_from_options(options: dict):
    mode = options.get("mode", "synthetic")
    if mode == "synthetic":
        n = int(options.get("n_symbols", "50"))
        return lambda day: synthetic_day(day, n)
    if mode == "http":
        from securities_pricing_data_pipeline_spark.sources.eod_api import http_fetcher

        return http_fetcher(
            options["base_url"], options["api_key"], int(options.get("timeout_s", "60"))
        )
    raise ValueError(f"unknown eod_bars mode: {mode!r}")


def _date_range(options: dict) -> list[dt.date]:
    start = dt.date.fromisoformat(options["start_date"])
    end = dt.date.fromisoformat(options["end_date"])
    if end < start:
        raise ValueError(f"end_date {end} < start_date {start}")
    return [start + dt.timedelta(days=k) for k in range((end - start).days + 1)]


class _DayPartition(InputPartition):
    def __init__(self, day: str):
        self.day = day  # ISO string: partitions must pickle cheaply


class EodBarsBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)

    def partitions(self):
        return [_DayPartition(d.isoformat()) for d in _date_range(self.options)]

    def read(self, partition: _DayPartition):
        # runs on the executor: fetch + project exactly one date
        day = dt.date.fromisoformat(partition.day)
        fetcher = _fetcher_from_options(self.options)
        yield from _project(day, fetcher(day))


class EodBarsStreamReader(SimpleDataSourceStreamReader):
    """Daily-poll micro-batches: offset = next unread date. Each batch
    covers up to ``days_per_batch`` dates, never past ``end_date``."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.days_per_batch = int(options.get("days_per_batch", "1"))

    def initialOffset(self):
        return {"next": self.options["start_date"]}

    def read(self, start: dict):
        first = dt.date.fromisoformat(start["next"])
        end = dt.date.fromisoformat(self.options["end_date"])
        if first > end:
            return iter([]), start
        last = min(first + dt.timedelta(days=self.days_per_batch - 1), end)
        fetcher = _fetcher_from_options(self.options)
        rows = []
        day = first
        while day <= last:
            rows.extend(_project(day, fetcher(day)))
            day += dt.timedelta(days=1)
        return iter(rows), {"next": (last + dt.timedelta(days=1)).isoformat()}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: deterministic fetch makes this exact
        first = dt.date.fromisoformat(start["next"])
        last = dt.date.fromisoformat(end["next"]) - dt.timedelta(days=1)
        fetcher = _fetcher_from_options(self.options)
        day = first
        while day <= last:
            yield from _project(day, fetcher(day))
            day += dt.timedelta(days=1)


class EodBarsDataSource(DataSource):
    """Register with ``spark.dataSource.register(EodBarsDataSource)``;
    then ``spark.read.format("eod_bars").option("start_date", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "eod_bars"

    def schema(self):
        return EOD_CSV_SCHEMA

    def reader(self, schema):
        return EodBarsBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return EodBarsStreamReader(self.options)
