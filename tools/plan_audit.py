"""Physical-plan audit over the bench query set.

For every headline query, compiles the physical plan (no execution) and
extracts the features that decide 100 TB behavior: shuffle count,
broadcast vs sort-merge joins, whole-stage-codegen coverage, Python
(Arrow) boundaries, and whether parquet scans carry pushed filters.
Writes PLAN_AUDIT.md (table, committed per round) so plan-shape
regressions show up in diffs, not just in timings.

Usage: python tools/plan_audit.py [sf_dir] [out.md]

Streaming-executed gate queries are skipped: calling them RUNS a stream;
their plans are covered by the streaming tests.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from securities_pricing_data_pipeline_spark.session import get_spark  # noqa: E402


def plan_features(explain: str) -> dict[str, int | str]:
    def n(pat: str) -> int:
        return len(re.findall(pat, explain))

    scans = n(r"Scan parquet")
    pushed_nonempty = len(
        [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", explain) if m.strip()]
    )
    return {
        "exchanges": n(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)"),
        "bcast_joins": n(r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
        "smj": n(r"SortMergeJoin"),
        "python": n(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow"),
        "scans": scans,
        "pushed": f"{pushed_nonempty}/{scans}",
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.md"
    spark = get_spark("plan-audit")
    queries = entry_mod.queries()

    rows = []
    for name in BENCH_QUERIES:
        if name.startswith("stream_") or name not in queries:
            continue
        try:
            # audit each query on a clean session: a prior query's
            # .cache()/persist of a shared silver frame would otherwise
            # replace this query's scan subtree with InMemoryRelation and
            # mis-report its shuffle/python/pushdown counts (r4 audit bug)
            spark.catalog.clearCache()
            df = queries[name](spark, sf_dir)
            explain = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
            )
            rows.append((name, plan_features(explain)))
        except Exception as ex:  # noqa: BLE001 — audit must not die on one query
            rows.append((name, {"error": f"{type(ex).__name__}: {ex}"[:120]}))

    lines = [
        "# PLAN_AUDIT — physical-plan features of the bench query set",
        "",
        f"Scale factor dir: `{sf_dir}`. Columns: shuffle exchanges, broadcast",
        "joins, sort-merge joins, Python (Arrow) boundary operators, parquet",
        "scans with non-empty `PushedFilters` / total parquet scans (cached",
        "silver reads show 0/0 — the filter pushed down when the silver was",
        "built). Streaming-executed gate queries are excluded BY DESIGN —",
        "compiling them runs a stream; their shapes are covered by the",
        "streaming tests. Codegen is not reported: AQE plans only annotate codegen",
        "stages post-execution. Regenerate: `python tools/plan_audit.py`.",
        "",
        "| query | exchanges | bcast | smj | python | pushed/scans |",
        "|---|---|---|---|---|---|",
    ]
    for name, f in rows:
        if "error" in f:
            lines.append(f"| {name} | ERROR: {f['error']} | | | | |")
        else:
            lines.append(
                f"| {name} | {f['exchanges']} | {f['bcast_joins']} | {f['smj']} "
                f"| {f['python']} | {f['pushed']} |"
            )
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}: {len(rows)} queries audited")


if __name__ == "__main__":
    main()
