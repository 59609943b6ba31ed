"""MERGE-family table maintenance without Delta (SURVEY §2.4 A5/A6/A7).

The reference's unit of work is one trading date, so the upsert
(``MERGE ... WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT``,
``4. merge_core.sql:53-96``, ``7. merge_fact_daily_price.sql:23-52``)
is reproduced exactly by **dynamic partition overwrite**: rewrite the
affected ``trade_date`` partitions as dedup(source ∪ existing-partition).
Untouched partitions are never read or written — at 100 TB a daily run
touches one partition regardless of table size.

Insert-only merges (``WHEN NOT MATCHED THEN INSERT`` only — rejects, dims;
``4.:24-45``, ``5.:22-37``, ``6.:17-37``) are a left-anti join + append:
first write wins, existing rows never updated.

Note (SURVEY A5): the reference header comments promise a guarded UPDATE,
but the code's ``WHEN MATCHED`` has no guard — updates are unconditional;
we implement the code's semantics (source wins over target).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.operators.dedup import dedup_latest


def _table_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def upsert_partitions(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_col: str = "trade_date",
    prefer_source_order: Sequence[Column] | None = None,
) -> None:
    """A5 upsert: rewrite only the partitions present in ``source`` with
    dedup(source ∪ matching-existing), source rows winning on key collision.

    ``prefer_source_order``: optional extra ordering columns for the
    keep-one window (after the source-wins flag).
    """
    source = source.cache()
    if _table_exists(spark, path):
        existing = spark.read.parquet(path)
        # only the partitions being rewritten (partition pruning via semi join
        # on the partition values — small, collected once)
        part_vals = [r[0] for r in source.select(partition_col).distinct().collect()]
        existing = existing.filter(F.col(partition_col).isin(part_vals))
        tagged = source.withColumn("__is_src", F.lit(1)).unionByName(
            existing.withColumn("__is_src", F.lit(0))
        )
        order = [F.desc("__is_src")] + list(prefer_source_order or [])
        merged = dedup_latest(tagged, list(keys), order).drop("__is_src")
    else:
        merged = dedup_latest(
            source.withColumn("__is_src", F.lit(1)),
            list(keys),
            [F.desc("__is_src")] + list(prefer_source_order or []),
        ).drop("__is_src")
    # dynamic partitionOverwriteMode (session.py) → only these partitions move
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    source.unpersist()


def insert_if_absent(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: Sequence[str],
) -> int:
    """A6 insert-only merge: append source rows whose key is absent from the
    target; existing rows are never touched (first write wins). Returns the
    number of rows appended."""
    if _table_exists(spark, path):
        target_keys = spark.read.parquet(path).select(*keys)
        new_rows = source.join(target_keys, list(keys), "left_anti")
    else:
        new_rows = source
    # dedup within the batch too (first occurrence wins deterministically)
    new_rows = dedup_latest(new_rows, list(keys), [F.asc(k) for k in keys]).cache()
    n = new_rows.count()
    if n:
        new_rows.write.mode("append").parquet(path)
    new_rows.unpersist()
    return n
