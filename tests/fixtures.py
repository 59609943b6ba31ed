"""Deterministic OHLCV landing-file fixtures (FIXTURES.md §1).

Covers every edge case the reference exercises: negative-volume injects
(the reference's S4 fault fixture), duplicate keys differing only in load
metadata, case/whitespace symbol variants, empty-string and literal-NULL
price fields, and whole-file re-delivery.
"""

from __future__ import annotations

import datetime as dt
import os
import random


def write_eod_csv(dir_path: str, trading_date: dt.date, n_symbols: int = 50, seed: int = 7) -> str:
    """One landing CSV for a date; returns the file path."""
    rnd = random.Random(seed + trading_date.toordinal())
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, f"eod_{trading_date.isoformat()}.csv")
    lines = ["trade_date,symbol,open,high,low,close,volume"]
    d = trading_date.isoformat()
    for i in range(n_symbols):
        sym = f"SYM{i:03d}"
        base = 10 + (i * 7 % 90) + rnd.random()
        o = round(base, 4)
        c = round(base * (1 + (rnd.random() - 0.5) / 10), 4)
        h = round(max(o, c) * 1.01, 4)
        low = round(min(o, c) * 0.99, 4)
        v = rnd.randint(1_000, 9_999_999)
        lines.append(f"{d},{sym},{o},{h},{low},{c},{v}")
    # 1. reject fixture: negative volumes (eod_data_downloader.py:64-79)
    lines.append(f"{d},AAPL_X,192.3,195.6,191.8,194.1,-1500000")
    lines.append(f"{d},ZZZ_TEST,10.0,11.0,9.0,10.5,-42")
    # 2. duplicate key (same symbol+date, different prices — dedup target)
    lines.append(f"{d},SYM001,99.0,99.9,98.0,99.5,123456")
    # 3. case/whitespace variants collapsing after UPPER(TRIM(...))
    lines.append(f'{d}," sym002 ",55.0,56.0,54.0,55.5,222222')
    # 4. empty-string and literal-NULL price fields
    lines.append(f"{d},NULLY,,NULL,1.0,2.0,777")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path


def write_corrupt_eod_csv(dir_path: str, trading_date: dt.date) -> tuple[str, int, int]:
    """Landing CSV exercising ON_ERROR='CONTINUE': returns
    (path, n_good, n_bad). Bad rows cover the two damage classes the
    reference's loader skips (``1. copy_to_raw.sql:38``):
    structural (wrong token count) and single-field cast failure —
    the latter is the case plain DROPMALFORMED would half-load."""
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, f"eod_corrupt_{trading_date.isoformat()}.csv")
    d = trading_date.isoformat()
    good = [
        f"{d},GOOD1,10.0,11.0,9.0,10.5,1000",
        f"{d},GOOD2,20.0,21.0,19.0,20.5,2000",
        f"{d},NULLY,,NULL,1.0,2.0,777",  # NULL_IF sentinels are NOT errors
    ]
    bad = [
        f"{d},BADPRICE,not_a_number,11.0,9.0,10.5,1000",  # field cast failure
        f"not_a_date,BADDATE,10.0,11.0,9.0,10.5,1000",  # date cast failure
        f"{d},SHORTROW,10.0",  # structural: too few tokens
    ]
    lines = ["trade_date,symbol,open,high,low,close,volume"] + good + bad
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path, len(good), len(bad)
