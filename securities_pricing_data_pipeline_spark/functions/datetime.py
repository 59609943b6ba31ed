"""Date/time scalar functions with the reference's Snowflake semantics.

Each function documents the Snowflake expression it reproduces and the
Spark↔Snowflake delta it papers over (SURVEY.md §2.5, §2.7). All are
pure Column expressions — JVM-side, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_sk(c: Column) -> Column:
    """yyyymmdd integer surrogate key.

    Reference: ``TO_NUMBER(TO_CHAR(date,'YYYYMMDD'))``
    (``dags/sql/6. dm_dim_date.sql:20``, ``7. merge_fact_daily_price.sql:26``).
    """
    return F.date_format(c, "yyyyMMdd").cast("int")


def day_of_week_0sun(c: Column) -> Column:
    """Day of week, 0=Sunday … 6=Saturday (Snowflake convention).

    Spark's ``dayofweek`` is 1=Sunday…7=Saturday, so subtract 1
    (reference: ``EXTRACT(DAYOFWEEK ...)``, ``6. dm_dim_date.sql:28``).
    """
    return (F.dayofweek(c) - F.lit(1)).cast("int")


def is_weekend(c: Column) -> Column:
    """``IFF(EXTRACT(DAYOFWEEK ...) IN (0,6), TRUE, FALSE)``
    (``6. dm_dim_date.sql:30``): Sunday or Saturday."""
    return F.dayofweek(c).isin(1, 7)


def week_of_year_iso(c: Column) -> Column:
    """ISO week number — pinned ISO semantics (``6. dm_dim_date.sql:29``;
    SURVEY §2.7 item 2)."""
    return F.weekofyear(c).cast("int")


def month_name_abbrev(c: Column) -> Column:
    """3-letter English month name ('Jan'); reference ``MONTHNAME(d)``
    (``6. dm_dim_date.sql:25``). Locale pinned by session UTC/en defaults."""
    return F.date_format(c, "MMM")


def day_name_abbrev(c: Column) -> Column:
    """3-letter English day name ('Mon'); reference ``DAYNAME(d)``
    (``6. dm_dim_date.sql:27``)."""
    return F.date_format(c, "EEE")
