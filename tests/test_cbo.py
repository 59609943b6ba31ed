"""Cost-based optimizer join reordering, pinned.

At 100 TB, join ORDER is the difference between shuffling the fact table
once and shuffling an intermediate the size of the fact table twice.
Catalyst's CBO reorders inner-join trees from table/column statistics
(``ANALYZE TABLE … COMPUTE STATISTICS``) — but only when stats exist and
``spark.sql.cbo.joinReorder.enabled`` is on. This test pins the whole
chain (stats collection → CBO → a reordered plan) on the engine's
canonical star shape, so a conf or version change that silently drops
stats-based planning fails here instead of surfacing as a cluster-scale
regression.

The query is written in the WORST left-deep order — fact ⋈ mid, then
⋈ tiny — and the assertion is that CBO rewrites it to join the two
dimension-sized tables first (their join fits in memory; the fact table
is then probed once).
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from securities_pricing_data_pipeline_spark.queries.helpers import load  # noqa: E402

SF = "/root/testdata/sf0.001"

_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # force shuffle joins so the plan shows pure ordering, not broadcast
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture(scope="module")
def analyzed_tables(spark):
    for name, table in [
        ("lineitem", "cbo_lineitem"),
        ("supplier", "cbo_supplier"),
        ("nation", "cbo_nation"),
    ]:
        load(spark, SF, name).write.mode("overwrite").saveAsTable(table)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    yield "cbo_lineitem", "cbo_supplier", "cbo_nation"
    for table in ("cbo_lineitem", "cbo_supplier", "cbo_nation"):
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _with_confs(spark, confs):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _scan_order(plan: str, tables: list[str]) -> list[int]:
    return [plan.index(t) for t in tables]


def test_cbo_reorders_fact_first_join(spark, analyzed_tables):
    li, su, na = analyzed_tables
    sql = f"""
        SELECT n.n_name, COUNT(*) AS n
        FROM {li} l
        JOIN {su} s ON l.l_suppkey = s.s_suppkey
        JOIN {na} n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """
    old = _with_confs(spark, _CONFS)
    try:
        cbo_plan = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        naive_plan = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
    finally:
        _restore(spark, old)
    # syntactic left-deep order joins (lineitem ⋈ supplier) first: the
    # lineitem relation prints before nation in the naive tree
    li_pos, na_pos = _scan_order(naive_plan, [li, na])
    assert li_pos < na_pos, naive_plan
    # CBO must flip it: supplier ⋈ nation (dim-sized) joins first, the
    # fact table is probed by the combined dim — nation prints before
    # lineitem in the reordered tree
    na_pos_cbo, li_pos_cbo = _scan_order(cbo_plan, [na, li])
    assert na_pos_cbo < li_pos_cbo, cbo_plan


def test_cbo_plan_result_unchanged(spark, analyzed_tables):
    """Reordering is an optimization, never a semantics change."""
    li, su, na = analyzed_tables
    q = (
        spark.table(li)
        .join(spark.table(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(spark.table(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )
    old = _with_confs(spark, _CONFS)
    try:
        with_cbo = {(r["n_name"], r["n"]) for r in q.collect()}
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        without = {(r["n_name"], r["n"]) for r in q.collect()}
    finally:
        _restore(spark, old)
    assert with_cbo == without and len(with_cbo) > 0
