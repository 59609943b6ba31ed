#!/usr/bin/env python
"""Physical-plan lint for every registered query.

Greps `.explain("formatted")` output for scale red flags:

  * CartesianProduct — unbounded all-pairs blowup
  * BroadcastNestedLoopJoin — fine only when one side is tiny by design
  * BatchEvalPython / ArrowEvalPython — Python in the hot path
  * Exchange SinglePartition — global shuffle to one task (only OK after a
    reduction to ~one row per group, e.g. final ranks over per-symbol aggs)
  * rangepartitioning — global sorts (OK for final ORDER BY ... LIMIT)
  * shuffle count — every Exchange is a full network pass at 100 TB

Usage: python tools/plan_lint.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def plan_of(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


FLAGS = {
    "cartesian": re.compile(r"CartesianProduct"),
    "bnl_join": re.compile(r"BroadcastNestedLoopJoin"),
    "python": re.compile(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)"),
    "single_part": re.compile(r"Exchange SinglePartition|SinglePartition, ENSURE"),
    "global_sort": re.compile(r"rangepartitioning"),
}


def main() -> int:
    from securities_pricing_data_pipeline_spark.session import get_spark
    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    qs = entry.queries()
    rows = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            p = plan_of(fn(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001
            rows.append((name, f"ERROR {type(ex).__name__}: {ex}"))
            continue
        n_ex = len(re.findall(r"\(\d+\) Exchange", p))
        hits = [k for k, rx in FLAGS.items() if rx.search(p)]
        rows.append((name, f"exchanges={n_ex}" + (f" flags={','.join(hits)}" if hits else "")))
    width = max(len(n) for n, _ in rows)
    for name, info in rows:
        print(f"{name:<{width}}  {info}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
