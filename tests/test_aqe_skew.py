"""AQE runtime skew-join splitting — the 100 TB skew posture, verified.

session.py pins `spark.sql.adaptive.skewJoin.enabled=true` as the engine's
primary defense against hot join keys (SURVEY §6: salting is the fallback in
`operators/skew.py`; AQE splitting is the default path). This test proves the
conf stack actually fires: a sort-merge join with one pathological key is
re-planned at runtime into `SortMergeJoin(skew=true)` reading split partitions
(`AQEShuffleRead skewed`), so no single task carries the hot key alone.

Two sharp edges this test pins down (both cost an afternoon if forgotten):
- the *executed* join must be the DataFrame whose plan you inspect — a
  downstream `count()` wraps the join in an extra shuffle-bound aggregate and
  AQE then declines to split (it would break the agg's partitioning);
- thresholds are bytes-based, so the fixture uses a hot key heavy enough
  (~90k rows) to clear `skewedPartitionThresholdInBytes` at test scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_conf(spark):
    saved = {}
    for k, v in _CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(skew_conf):
    spark = skew_conf
    # 90% of 100k rows land on key 0; 50 cold keys carry the rest.
    fact = spark.range(0, 100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % 50) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 51).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    j = fact.join(dim, "k")
    rows = j.collect()  # execute THIS DataFrame so AQE finalizes its plan
    assert len(rows) == 100_000

    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead skewed" in plan, plan
