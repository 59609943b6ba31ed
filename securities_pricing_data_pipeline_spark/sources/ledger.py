"""S7/A7: processed-file ledger — load-history idempotency for bronze.

Snowflake's load history normally makes ``COPY INTO`` idempotent per file;
the reference defeats that with ``FORCE=TRUE`` (``1. copy_to_raw.sql:39``),
so its RAW layer can hold duplicates and downstream dedup (A4) restores
idempotency. We replicate that contract (bronze may hold dupes) but ALSO
provide the ledger so ``force=False`` ingestion can skip already-loaded
files — the behavior the reference's own header comment promises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.operators.merge import _table_exists
from securities_pricing_data_pipeline_spark.schemas import INGEST_LEDGER_SCHEMA


def processed_files(spark: SparkSession, ledger_path: str) -> DataFrame:
    if _table_exists(spark, ledger_path):
        return spark.read.parquet(ledger_path).select("src_file")
    return spark.createDataFrame([], INGEST_LEDGER_SCHEMA).select("src_file")


def filter_unprocessed(spark: SparkSession, df: DataFrame, ledger_path: str) -> DataFrame:
    """Drop rows whose _src_file is already in the ledger (anti join on the
    broadcastable ledger — one row per file ever loaded)."""
    seen = processed_files(spark, ledger_path)
    return df.join(F.broadcast(seen), df._src_file == seen.src_file, "left_anti")


def record_files(spark: SparkSession, df: DataFrame, ledger_path: str) -> None:
    """Append (src_file, ingest_ts, row_count) entries for df's files."""
    entries = df.groupBy(F.col("_src_file").alias("src_file")).agg(
        F.max("_ingest_ts").alias("ingest_ts"), F.count("*").alias("row_count")
    )
    entries.write.mode("append").parquet(ledger_path)
