"""S3/S5/S7: CSV landing-file read with the reference's load semantics.

Reproduces ``dags/sql/1. copy_to_raw.sql:15-39``:
  * declared schema, positional/typed projection (never inferred);
  * CSV dialect: ``,`` delimiter, 1 header row, NULL_IF ('', 'NULL');
  * filename pattern ``*.csv`` / ``*.csv.gz`` via pathGlobFilter;
  * ``ON_ERROR='CONTINUE'`` ≈ DROPMALFORMED (SURVEY §2.7 item 6: Spark
    drops only unparseable rows, not single-field cast failures — exact
    parity would need columnNameOfCorruptRecord; the fixture corpus has no
    such rows, matching the reference's observed inputs);
  * lineage columns ``_src_file`` (METADATA$FILENAME) and ``_ingest_ts``
    (CURRENT_TIMESTAMP) stamped at read time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.schemas import EOD_CSV_SCHEMA


def file_exists_gate(path: str) -> None:
    """S5: explicit existence/size assertion before read (parity with
    ``get_securities_data.py:74-96``). Local paths only; on object stores
    rely on the read itself."""
    if path.startswith(("/", "file:")) and not os.path.exists(path.removeprefix("file:")):
        raise FileNotFoundError(f"landing file/dir missing: {path}")


def read_eod_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read landing CSVs into the bronze shape (typed + lineage)."""
    df = (
        spark.read.schema(EOD_CSV_SCHEMA)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .option("pathGlobFilter", "*.csv*")
        .option("nullValue", "NULL")  # literal 'NULL' → null
        .option("emptyValue", None)  # empty string → null (second NULL_IF sentinel)
        .csv(path)
    )
    return df.withColumn("_src_file", F.input_file_name()).withColumn(
        "_ingest_ts", F.current_timestamp()
    )
