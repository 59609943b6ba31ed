"""The eod_bars Python Data Source (Spark 4 datasource API): batch reads
partition per date on executors; the stream reader advances a date offset
per micro-batch. Synthetic mode is deterministic, so batch and stream
over the same window must agree exactly."""

from __future__ import annotations

import datetime as dt
import sys

import pytest

sys.path.insert(0, "/root/repo")

from securities_pricing_data_pipeline_spark.schemas import EOD_CSV_SCHEMA  # noqa: E402
from securities_pricing_data_pipeline_spark.sources.eod_datasource import (  # noqa: E402
    EodBarsDataSource,
    synthetic_day,
)


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(EodBarsDataSource)


def _batch(spark, **opts):
    reader = spark.read.format("eod_bars")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_batch_read_week(spark):
    # Mon 2026-01-05 .. Sun 2026-01-11: 5 trading days, weekend empty
    df = _batch(spark, start_date="2026-01-05", end_date="2026-01-11", n_symbols=7)
    assert df.schema == EOD_CSV_SCHEMA
    rows = df.collect()
    assert len(rows) == 5 * 7
    dates = {r.trade_date for r in rows}
    assert dt.date(2026, 1, 10) not in dates and len(dates) == 5
    # one input partition per calendar date (7), regardless of row counts
    assert df.rdd.getNumPartitions() == 7


def test_batch_values_match_generator(spark):
    day = dt.date(2026, 1, 6)
    df = _batch(spark, start_date=day.isoformat(), end_date=day.isoformat(), n_symbols=3)
    got = {r.symbol: (r.open, r.close, int(r.volume)) for r in df.collect()}
    for r in synthetic_day(day, 3):
        o, c, v = got[r["T"]]
        assert (o, c, v) == (r["o"], r["c"], r["v"])


def test_stream_matches_batch(spark, tmp_path):
    opts = {"start_date": "2026-01-05", "end_date": "2026-01-09", "n_symbols": 4}
    batch_rows = sorted(
        (r.trade_date, r.symbol, r.close) for r in _batch(spark, **opts).collect()
    )

    reader = spark.readStream.format("eod_bars")
    for k, v in opts.items():
        reader = reader.option(k, v)
    out: list[tuple] = []

    def capture(b, _):
        out.extend((r.trade_date, r.symbol, r.close) for r in b.collect())

    # Python stream sources don't support Trigger.AvailableNow (Spark falls
    # back to one batch) — run ASAP micro-batches and stop once the offset
    # has advanced through the whole window (one date per batch)
    import time

    q = (
        reader.load()
        .writeStream.foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    deadline = time.monotonic() + 180
    while len(out) < len(batch_rows) and time.monotonic() < deadline:
        time.sleep(0.5)
    q.stop()
    assert sorted(out) == batch_rows
