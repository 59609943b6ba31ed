"""Key/value normalization expressions.

The reference normalizes the business key with ``UPPER(TRIM(SYMBOL))`` at
every join/merge site (``4. merge_core.sql:28,58,83``,
``5. merge_dim_security.sql:26,29``). We normalize **once at silver write**
so every downstream join is a plain equality on an already-canonical key —
re-normalizing the *target* side of a join (as ``4.:83`` does) would defeat
partition pruning and bucketed-join co-location at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_symbol(c: Column) -> Column:
    """``UPPER(TRIM(symbol))``."""
    return F.upper(F.trim(c))


def null_if(c: Column, sentinels: tuple[str, ...] = ("", "NULL")) -> Column:
    """Reproduce the CSV dialect ``NULL_IF = ('', 'NULL')``
    (``1. copy_to_raw.sql:35``): sentinel strings become SQL NULL.

    Spark's csv reader handles one ``nullValue``; additional sentinels get
    this second pass (SURVEY §2.7 item 5).
    """
    out = c
    for s in sentinels:
        out = F.when(out == F.lit(s), F.lit(None)).otherwise(out)
    return out
