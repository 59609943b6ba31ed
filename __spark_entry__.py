"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship liquidity query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator inventory from
SURVEY.md §2 (plus the LLM-data-pipeline extensions) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-20 securities by 30-day rolling average traded value
    with liquidity rank (SURVEY §2.6 Q2+Q3+Q6) over sf0.001 bars."""
    from securities_pricing_data_pipeline_spark.queries.serving import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from securities_pricing_data_pipeline_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from securities_pricing_data_pipeline_spark.queries import ORACLES

    return dict(ORACLES)
