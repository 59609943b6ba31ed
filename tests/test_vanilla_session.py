"""Harness-session independence (VERDICT r2 item 2).

The correctness driver builds its own plain SparkSession — none of the
factory pins in session.py apply there. Every query callable must therefore
be self-sufficient: in round 2, nine events-reading queries died with
PARQUET_TYPE_ILLEGAL because `spark.sql.legacy.parquet.nanosAsLong` lived
only in the factory. These tests strip the conf back to its vanilla default
and assert (a) the raw read really does fail without the conf — so the test
cannot silently rot — and (b) the query path heals itself via helpers.load().
"""

from __future__ import annotations

import pytest
from pyspark.sql.utils import AnalysisException

from securities_pricing_data_pipeline_spark.queries.eventsq import (
    events_funnel,
    events_hourly_stats,
)
from securities_pricing_data_pipeline_spark.queries.relational import a4_dedup_latest

_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def vanilla_conf(spark):
    """Temporarily reset the nanos conf to Spark's default (false)."""
    spark.conf.unset(_CONF)
    yield spark
    spark.conf.set(_CONF, "true")


def test_raw_events_read_fails_without_conf(vanilla_conf, sf_dir):
    spark = vanilla_conf
    assert spark.conf.get(_CONF) == "false"
    with pytest.raises(AnalysisException, match="PARQUET_TYPE_ILLEGAL"):
        spark.read.parquet(f"{sf_dir}/events.parquet").schema


def test_events_queries_heal_on_vanilla_session(vanilla_conf, sf_dir):
    spark = vanilla_conf
    assert events_hourly_stats(spark, sf_dir).count() > 0
    spark.conf.unset(_CONF)
    assert events_funnel(spark, sf_dir).count() == 1
    spark.conf.unset(_CONF)
    assert a4_dedup_latest(spark, sf_dir).count() > 0
