"""Dynamic partition pruning: joining a date-partitioned fact to a
filtered dim must prune fact partitions at RUNTIME via a dim-side
subquery (`dynamicpruningexpression` on the scan's PartitionFilters) — at
100 TB this is the difference between reading 2 date partitions and all
of them.

Catalyst gotcha this test pins: DPP's `isLikelySelective` heuristic
requires a REAL predicate on the dim (comparison/IN/LIKE); a bare boolean
attribute filter (`WHERE d.is_hot`) is not considered selective and DPP
silently stays off — so dims should model flags as comparable values or
filter with explicit comparisons."""

from __future__ import annotations

import datetime as dt
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def dpp_tables(spark, tmp_path_factory):
    from securities_pricing_data_pipeline_spark.queries.bars import bars_df

    spark.sql("DROP TABLE IF EXISTS dpp_fact")
    spark.sql("DROP TABLE IF EXISTS dpp_dim")
    fact = bars_df(spark, "/root/testdata/sf0.001").filter(
        F.col("trade_date") < F.lit("1996-03-01").cast("date")
    )
    fact.write.partitionBy("trade_date").saveAsTable("dpp_fact")
    spark.createDataFrame(
        [(dt.date(1996, 1, 5), "hot"), (dt.date(1996, 1, 8), "cold")],
        "trade_date date, temp string",
    ).write.saveAsTable("dpp_dim")
    yield
    spark.sql("DROP TABLE IF EXISTS dpp_fact")
    spark.sql("DROP TABLE IF EXISTS dpp_dim")


def _plan(spark, sql):
    df = spark.sql(sql)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df, df._jdf.queryExecution().explainString(mode)


def test_selective_dim_filter_triggers_dpp(spark, dpp_tables):
    df, plan = _plan(
        spark,
        "SELECT * FROM dpp_fact f JOIN dpp_dim d ON f.trade_date = d.trade_date "
        "WHERE d.temp = 'hot'",
    )
    assert "dynamicpruningexpression" in plan
    rows = df.collect()
    assert rows and all(r.trade_date == dt.date(1996, 1, 5) for r in rows)


def test_bare_boolean_filter_does_not_trigger_dpp(spark, dpp_tables):
    # documents the heuristic: no comparison → no DPP (regression canary —
    # if Spark ever starts pruning here, the modeling advice above is stale)
    _, plan = _plan(
        spark,
        "SELECT * FROM dpp_fact f JOIN dpp_dim d ON f.trade_date = d.trade_date "
        "WHERE d.temp IS NOT NULL",
    )
    assert "dynamicpruningexpression" not in plan
