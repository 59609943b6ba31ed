"""Data-quality gates: reject split (P3) and the existence gate (P5).

Reference: negative-volume rows are preserved in a reject/audit table with
``REJECT_REASON='NEGATIVE_VOLUME'`` (``4. merge_core.sql:24-45``); the
post-load row-count gate (``2. check_loaded.sql``) is advisory in the
reference (the operator doesn't fail on FALSE) — here it is a real
assertion, as SURVEY §2.2 P5 prescribes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NEGATIVE_VOLUME = "NEGATIVE_VOLUME"


def split_rejects(
    df: DataFrame, valid_cond: Column, reason: str
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, rejects); rejects carry a reject_reason column.

    One source scan feeds both sides; null-safe: rows where the condition
    is NULL are treated as valid (matching the reference, whose reject
    predicate ``VOLUME < 0`` is false for NULL volumes).
    """
    fails = valid_cond.isNotNull() & ~valid_cond
    valid = df.filter(~fails)
    rejects = df.filter(fails).withColumn("reject_reason", F.lit(reason))
    return valid, rejects


class EmptyLoadError(AssertionError):
    pass


def existence_gate(df: DataFrame, what: str = "load") -> None:
    """P5 as a real assertion: fail the run if the frame is empty.
    Uses limit(1) — never a full count."""
    if df.limit(1).count() == 0:
        raise EmptyLoadError(f"existence gate failed: {what} produced 0 rows")
