"""Financial derived-measure expressions shared by serving queries and
oracles (SURVEY §2.6). Kept in one module so Spark queries and their SQL
oracles use the *same* arithmetic (decimal-exact sums, per-row double math)
and hash-compare bit-for-bit."""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def traded_value(close: Column, volume: Column) -> Column:
    """close × volume — the liquidity measure behind the reference's
    "Total Traded Value" card (dashboard/securities_market_report1.jpg)."""
    return close * volume


def daily_return(close: Column, symbol_col: str = "symbol", date_col: str = "trade_date") -> Column:
    """(close − prev_close) / prev_close per symbol ordered by date
    (dashboard "Daily Average Return Trends")."""
    w = Window.partitionBy(symbol_col).orderBy(date_col)
    prev = F.lag(close).over(w)
    return (close - prev) / prev
