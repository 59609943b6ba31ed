"""S1/S2: EOD grouped-daily market-data source.

Reference behavior (``dags/lib/eod_data_downloader.py:24-61``):
  * GET ``/v2/aggs/grouped/locale/us/market/stocks/{date}`` with
    ``adjusted=true&include_otc=false``, 60 s timeout;
  * walk backward up to ``lookback_days`` calendar days until a day with
    ``resultsCount > 0`` (market holidays/weekends);
  * project API fields ``T,o,h,l,c,v`` → ``symbol,open,high,low,close,
    volume`` with a constant ``trade_date``, missing keys → NULL.

Spark-first shape: the fetch is a driver-side call that yields a small
per-day row list (≈10⁴ rows/day) → ``spark.createDataFrame``. At real
scale (per-minute bars, thousands of days backfill) the same ``fetch_day``
is distributed with ``mapInPandas`` over a frame of dates — each partition
fetches its own dates, no driver bottleneck (see ``backfill_source``).

No secrets/endpoints are baked in: callers pass base_url + api_key. Tests
inject a deterministic ``fetcher`` (no network in this environment).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from securities_pricing_data_pipeline_spark.schemas import EOD_CSV_SCHEMA

# fetcher: (date) -> list of API-shaped dicts with keys T,o,h,l,c,v (subset ok)
Fetcher = Callable[[dt.date], list[dict]]


def http_fetcher(base_url: str, api_key: str, timeout_s: int = 60) -> Fetcher:
    """Real HTTP fetcher (grouped-daily endpoint shape). Import-gated:
    requests may be absent in minimal images."""

    def fetch(day: dt.date) -> list[dict]:
        import requests  # gated import

        url = f"{base_url}/v2/aggs/grouped/locale/us/market/stocks/{day.isoformat()}"
        resp = requests.get(
            url,
            params={"adjusted": "true", "include_otc": "false", "apiKey": api_key},
            timeout=timeout_s,
        )
        resp.raise_for_status()
        payload = resp.json()
        if int(payload.get("resultsCount", 0)) <= 0:
            return []
        return payload.get("results", [])

    return fetch


def fetch_day_with_lookback(
    fetcher: Fetcher, requested: dt.date, lookback_days: int = 10
) -> tuple[dt.date, list[dict]]:
    """Walk backward until a day returns rows (holiday/weekend handling,
    ``eod_data_downloader.py:84-88``). Raises if the whole window is empty."""
    for off in range(lookback_days + 1):
        day = requested - dt.timedelta(days=off)
        rows = fetcher(day)
        if rows:
            return day, rows
    raise RuntimeError(f"no data within {lookback_days} days before {requested}")


def rows_to_frame(spark: SparkSession, day: dt.date, rows: list[dict]) -> DataFrame:
    """S2 projection/rename: T,o,h,l,c,v → typed bar columns; missing → NULL."""
    from decimal import Decimal

    def price(v):
        return Decimal(str(v)) if v is not None else None

    projected = [
        (
            day,
            r.get("T"),
            price(r.get("o")),
            price(r.get("h")),
            price(r.get("l")),
            price(r.get("c")),
            Decimal(int(r["v"])) if r.get("v") is not None else None,
        )
        for r in rows
    ]
    return spark.createDataFrame(projected, EOD_CSV_SCHEMA)


def backfill_source(
    spark: SparkSession, fetcher: Fetcher, days: list[dt.date], partitions: int | None = None
) -> DataFrame:
    """Distributed multi-day fetch: one task per chunk of dates, executed on
    executors via mapInPandas — the 100 TB-posture ingestion path."""
    import pandas as pd

    dates_df = spark.createDataFrame([(d,) for d in days], "trade_date date").repartition(
        partitions or min(len(days), 64)
    )

    def fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["trade_date"]:
                day = d if isinstance(d, dt.date) else d.date()
                for r in fetcher(day):
                    out.append(
                        {
                            "trade_date": day,
                            "symbol": r.get("T"),
                            "open": r.get("o"),
                            "high": r.get("h"),
                            "low": r.get("l"),
                            "close": r.get("c"),
                            "volume": r.get("v"),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["trade_date", "symbol", "open", "high", "low", "close", "volume"],
            )

    return dates_df.mapInPandas(fetch_batch, EOD_CSV_SCHEMA)
