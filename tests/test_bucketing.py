"""Bucketed silver tables must co-locate symbol-keyed joins: when both
sides are bucketed on the join key with equal bucket counts, the physical
plan carries NO shuffle exchange (the 100 TB posture in SURVEY §7 —
shuffling 100 TB per join is the difference between feasible and not)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from securities_pricing_data_pipeline_spark.queries.bars import bars_df  # noqa: E402
from securities_pricing_data_pipeline_spark.tables import write_bucketed  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    bars = bars_df(spark, SF)
    write_bucketed(
        bars, "silver_bars_b", str(root / "bars"), ["symbol"], 8, ["symbol", "trade_date"]
    )
    stats = bars.groupBy("symbol").agg(F.sum("volume").alias("total_volume"))
    write_bucketed(stats, "symbol_stats_b", str(root / "stats"), ["symbol"], 8)
    yield "silver_bars_b", "symbol_stats_b"
    spark.sql("DROP TABLE IF EXISTS silver_bars_b")
    spark.sql("DROP TABLE IF EXISTS symbol_stats_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    bars_t, stats_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(bars_t).join(spark.table(stats_t), "symbol")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides pre-partitioned by bucket
        # sorted buckets on the bars side: no extra sort before the join
        assert joined.count() == spark.table(bars_t).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    bars_t, _ = bucketed_tables
    agg = spark.table(bars_t).groupBy("symbol").agg(F.max("high").alias("max_high"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucket layout satisfies the distribution
    assert agg.count() == spark.table(bars_t).select("symbol").distinct().count()
