"""Round-14 optimization measurement harness (guide §1).

For each named query: N timed trials with the bench's every-column
xxhash64 forcing, plus per-trial Spark job/stage/task counts from the
status tracker, plan capture (``explain formatted``) to a file, and a
quick plan-shape summary (Exchange / SortMergeJoin / BroadcastHashJoin /
BatchEvalPython / ArrowEvalPython / WholeStageCodegen counts).

Usage:
  python tools/measure_r14.py [--plans DIR] [--suffix before|after]
                              [--trials N] [--sf SF_DIR] query [query ...]

Prints one line per trial and a JSON summary; writes
``DIR/<query>_<suffix>.txt`` when --plans is given.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from securities_pricing_data_pipeline_spark.session import get_spark  # noqa: E402

PLAN_NODES = [
    "Exchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "WholeStageCodegen",
    "Window",
    "Sort",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
]


def plan_shape(plan: str) -> dict[str, int]:
    out = {}
    for node in PLAN_NODES:
        n = len(re.findall(rf"\b{node}\b", plan))
        if n:
            out[node] = n
    return out


def main() -> None:
    argv = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    trials = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--plans":
            plans_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--suffix":
            suffix = argv[i + 1]
            i += 2
        elif argv[i] == "--trials":
            trials = int(argv[i + 1])
            i += 2
        elif argv[i] == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1

    spark = get_spark("measure_r14")
    sc = spark.sparkContext
    queries = entry_mod.queries()
    for t in (
        "lineitem", "orders", "customer", "part", "supplier",
        "nation", "region", "events", "documents", "embeddings",
    ):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    summary: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        rec: dict = {"trials": []}
        tracker = sc.statusTracker()
        for t in range(trials):
            jobs0 = set(tracker.getJobIdsForGroup() or [])
            n_jobs0 = max([0, *jobs0], default=0)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_plan = time.perf_counter() - t0
            df.agg(F.max(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()
            t_all = time.perf_counter() - t0
            jobs1 = tracker.getJobIdsForGroup() or []
            n_jobs = len([j for j in jobs1 if j > n_jobs0]) if jobs0 else len(jobs1)
            rec["trials"].append(
                {
                    "sec": round(t_all, 3),
                    "build_sec": round(t_plan, 3),
                    "jobs": n_jobs,
                }
            )
            print(
                f"{name} trial {t}: {t_all:.3f}s (df-build {t_plan:.3f}s, "
                f"{n_jobs} jobs)",
                flush=True,
            )
            if t == trials - 1:
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                rec["plan_shape"] = plan_shape(plan)
                if plans_dir:
                    os.makedirs(plans_dir, exist_ok=True)
                    with open(
                        os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
                    ) as fh:
                        fh.write(plan)
        secs = sorted(x["sec"] for x in rec["trials"])
        rec["median_sec"] = secs[len(secs) // 2]
        summary[name] = rec
        print(f"{name}: median {rec['median_sec']}s shape={rec.get('plan_shape')}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
