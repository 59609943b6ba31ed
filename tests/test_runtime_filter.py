"""Runtime bloom-filter join pruning, pinned.

At 100 TB the single biggest join saving after broadcast/bucketing is
row-level runtime filtering: when one join side is small AFTER its local
predicates but too big (or not known small enough at plan time) to
broadcast-join, Spark can build a bloom filter over its join keys and
inject a ``might_contain`` predicate into the probe-side SCAN, dropping
non-matching fact rows before the shuffle instead of after it. This test
pins that the optimizer actually injects the filter for the engine's
canonical shape (selectively-filtered orders driving a lineitem probe),
so a Spark-version or default-conf change that silently disables it fails
ONE obvious test instead of showing up as a 100 TB shuffle regression.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from securities_pricing_data_pipeline_spark.queries.helpers import load  # noqa: E402

SF = "/root/testdata/sf0.001"

_CONFS = {
    # force the injection decision to depend only on plan shape, not on
    # the tiny test files' byte sizes
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # broadcast would bypass the shuffle join the filter is meant to protect
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_bloom_filter_injected_on_probe_side(spark, bloom_confs):
    orders = load(spark, SF, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    li = load(spark, SF, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner").groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    plan = _optimized_plan(joined)
    assert "bloom_filter_agg" in plan or "BloomFilter" in plan, plan
    assert "might_contain" in plan, plan
    # the injected predicate must sit on the lineitem (probe) side
    probe_side = plan[plan.index("might_contain"):]
    assert "l_orderkey" in probe_side.split("\n")[0]


def test_bloom_filter_result_unchanged(spark, bloom_confs):
    """Filter injection is an optimization, never a semantics change."""
    orders = load(spark, SF, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    li = load(spark, SF, "lineitem")
    with_filter = (
        li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy().count().first()[0]
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = (
        li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy().count().first()[0]
    )
    assert with_filter == without
