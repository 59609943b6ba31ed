"""Shared parity discipline for Spark↔DuckDB oracle hash-matching.

Floating-point SUM/AVG is order-dependent, and Spark's partial aggregation
order differs from DuckDB's serial scan — so any query that sums doubles
would hash-mismatch. The engine's rule (documented once, applied everywhere;
SURVEY §2.7 item 4 / §7 risk 4):

  1. per-row arithmetic may use doubles (bit-deterministic on identical
     inputs in both engines);
  2. before ANY cross-row sum, snap the value to a decimal grid with
     ``dec(col, scale)`` — choose ``scale`` so |value|·10^scale ≲ 1e12,
     keeping the binary→decimal cast error far below half a grid unit in
     both engines (Spark casts via decimal string, DuckDB via binary
     multiply; they agree whenever the cast is unambiguous);
  3. aggregate the decimals — exact, order-independent in both engines;
  4. cast final scalars to double (exact for these magnitudes) and do any
     remaining division in double.

This yields bit-exact parity without sacrificing distributed partial
aggregation (decimal sums still combine map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # testdata `events.parquet` carries INT64 TIMESTAMP(NANOS), which Spark
    # rejects unless nanosAsLong is on. The conf is runtime-settable, so pin
    # it here (idempotent) rather than relying on the session factory — query
    # callables must work on ANY SparkSession, including the correctness
    # driver's vanilla one, not just session.get_spark()'s.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dec(c: Column, scale: int) -> Column:
    """Snap a double to an exact decimal grid (see module docstring)."""
    return c.cast(T.DecimalType(38, scale))


def dsum(c: Column, scale: int) -> Column:
    """Order-independent sum: snap to decimal, sum exactly, emit double."""
    return F.sum(dec(c, scale)).cast("double")


def davg(c: Column, scale: int) -> Column:
    """Order-independent mean: exact decimal sum / count, in double."""
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


# SQL-side equivalents for oracle strings
def sql_dec(expr: str, scale: int) -> str:
    return f"CAST({expr} AS DECIMAL(38,{scale}))"


def sql_dsum(expr: str, scale: int) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE) / COUNT({expr}))"
