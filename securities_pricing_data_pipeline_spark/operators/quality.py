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


def dq_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Declarative data-quality profile: one aggregate pass computes, for
    every requested column, null count, distinct count, and min/max (as
    strings, type-agnostic). The generalization of the reference's ad-hoc
    count gates — ONE job regardless of how many columns are profiled
    (reference runs one statement per metric). Output is long-form
    (column, metric, value) so downstream gates can assert on rows.

    Scale note: count_distinct per column shares the same shuffle via
    Spark's multi-distinct Expand rewrite; for very wide profiles switch
    to approx_count_distinct (one pass, no Expand) and a rows-only check.
    """
    aggs = [F.count("*").alias("__n_rows")]
    for c in columns:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    metrics = []
    for c in columns:
        for m in ("nulls", "distinct", "min", "max"):
            metrics.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit(m).alias("metric"),
                    F.col(f"{c}__{m}").cast("string").alias("value"),
                )
            )
    metrics.append(
        F.struct(
            F.lit("*").alias("column"),
            F.lit("n_rows").alias("metric"),
            F.col("__n_rows").cast("string").alias("value"),
        )
    )
    return wide.select(F.explode(F.array(*metrics)).alias("s")).select(
        "s.column", "s.metric", "s.value"
    )


def observe_write_metrics(df: DataFrame, name: str = "write_metrics"):
    """Attach free write-path metrics via the Observation API: row count,
    null-volume count, and negative-close count are computed BY the write
    action itself (an accumulator piggybacking on whatever job consumes
    ``df``) — zero extra scans, unlike the reference's count-statement-
    per-metric pattern (`dags/sql/8. new_row_count.sql`) and unlike
    ``dq_profile`` which is its own aggregate job. Read ``obs.get`` only
    AFTER an action has run over the returned frame.

    Returns (observed_df, observation).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("volume").isNull().cast("long")).alias("n_null_volume"),
        F.sum((F.col("close") < 0).cast("long")).alias("n_neg_close"),
    )
    return observed, obs
