"""Date range (interval-containment) join — the second extension join
SURVEY §2.3 flags as absent from the reference (alongside as-of): match
each probe date to every interval ``[start_col, end_col]`` containing it.

Spark's naive formulation (`probe JOIN build ON d BETWEEN start AND end`)
has no equi-key, so Catalyst plans a BroadcastNestedLoopJoin — O(n·m)
comparisons and a broadcast of one whole side. This implementation uses
the standard bucketed-equi-join rewrite (what Flink's interval join and
range-partitioned IEJoin systems do):

  1. explode each interval into the coarse calendar buckets it covers
     (`F.sequence(trunc(start), trunc(end), interval 1 month)`) —
     intervals spanning k buckets emit k rows;
  2. bucket each probe date the same way (one row, no expansion);
  3. plain shuffled equi-join on the bucket key;
  4. residual filter `start <= d <= end` removes same-bucket misses.

Cost profile: one shuffle on the bucket key, intermediate size
Σ per-bucket |probes| × |intervals| — bounded as long as the bucket
granularity is chosen near the typical interval span (expansion factor
≈ 1 + span/granularity). No nested loop, no full broadcast, and AQE can
split skewed buckets. At 100 TB this is shuffle-bound like any equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRAIN = {"month": "mm", "week": "week", "year": "year"}


def date_range_join(
    probe: DataFrame,
    intervals: DataFrame,
    probe_date: str,
    start_col: str,
    end_col: str,
    granularity: str = "month",
) -> DataFrame:
    """Inner-join ``probe`` rows to every ``intervals`` row whose
    ``[start_col, end_col]`` (inclusive both ends) contains ``probe_date``.

    ``granularity``: calendar bucket width ('week' | 'month' | 'year');
    pick it close to the typical interval span so the interval side's
    explode expansion stays ~2×.
    """
    fmt = _GRAIN[granularity]
    step = F.expr(f"interval 1 {granularity}")
    b = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.trunc(F.col(start_col), fmt), F.trunc(F.col(end_col), fmt), step)),
    )
    p = probe.withColumn("__bucket", F.trunc(F.col(probe_date), fmt))
    return (
        p.join(b, "__bucket")
        .filter((F.col(probe_date) >= F.col(start_col)) & (F.col(probe_date) <= F.col(end_col)))
        .drop("__bucket")
    )
