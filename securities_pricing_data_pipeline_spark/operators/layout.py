"""Multi-dimensional data-layout planning (Z-order clustering).

A 100 TB table queried by BOTH date and key cannot serve either predicate
well from a single-column sort: files are tight on the sort column and
span everything else. Interleaving the bits of the two dimensions (the
Morton / Z-order curve — the technique behind Delta ``OPTIMIZE ZORDER BY``
and Iceberg's sort-order transforms) gives every file a small bounding
box in BOTH dimensions, so min/max file statistics prune scans for either
predicate.

This module plans such a layout declaratively: assign every row a
Z-value (pure integer bit interleaving — JVM expressions, reproducible in
any engine), derive a target file id from its high bits, and report each
file's bounding box + row count. The plan output IS the skipping story: a
query on either dimension overlaps only files whose box intersects it.
Writing is then ``df.repartition(file_id).sortWithinPartitions(z)`` — one
hash shuffle, no global sort.

Production note: dimensions must be rank-normalized (quantile bucketed)
before interleaving when their domains are skewed or exceed ``bits``;
the callers here use naturally small integer domains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    ints: result bit 2i is bit i of ``x``, bit 2i+1 is bit i of ``y``.
    A sum of 2·bits shift/mask terms — whole-stage-codegen friendly, no
    UDF, and bit-identical in any engine with 64-bit integer ops."""
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_file_plan(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 16,
    file_shift: int = 22,
) -> DataFrame:
    """Layout plan: one row per target file — row count and the per-file
    bounding box over both source dimensions. ``file_shift`` controls
    granularity: file id = z >> file_shift, so each file covers a
    2^file_shift-cell square-ish tile of the curve.

    One hash aggregate on file id (map-side combines to one row per file
    per partition); the bounding boxes come free from the same pass.
    """
    zx = x.cast("long").alias("zx")
    zy = y.cast("long").alias("zy")
    rows = df.select(zx, zy).withColumn(
        "file_id", F.shiftright(z_value(F.col("zx"), F.col("zy"), bits), file_shift)
    )
    return rows.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("zx").alias("x_min"),
        F.max("zx").alias("x_max"),
        F.min("zy").alias("y_min"),
        F.max("zy").alias("y_max"),
    )


def zorder_oracle_sql(
    table: str, x_expr: str, y_expr: str, bits: int = 16, file_shift: int = 22
) -> str:
    """DuckDB twin of :func:`zorder_file_plan` — the same interleave as a
    generated SQL expression."""
    terms = []
    mask = (1 << bits) - 1
    for i in range(bits):
        terms.append(f"((((xv & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((yv & {mask}) >> {i}) & 1) << {2 * i + 1})")
    z = " | ".join(terms)
    return f"""
WITH src AS (
  SELECT CAST({x_expr} AS BIGINT) AS xv, CAST({y_expr} AS BIGINT) AS yv FROM {table}
), zed AS (
  SELECT xv, yv, ({z}) >> {file_shift} AS file_id FROM src
)
SELECT file_id, COUNT(*) AS n_rows,
       MIN(xv) AS x_min, MAX(xv) AS x_max,
       MIN(yv) AS y_min, MAX(yv) AS y_max
FROM zed
GROUP BY file_id
"""
