"""Round-15 paired A/B harness (guide §1).

Settles VERDICT r14 item 1: is the session-wide AQE
``coalescePartitions.minPartitionSize=64k`` floor (session.py) a net win
or loss across the FULL bench at 32 cores? The conf is a runtime SQL
conf, so both settings run in ONE session, paired per query:

  for each query: 1 untimed warm-up trial (builds any cached silver so
  neither arm pays it), then N timed trials per arm; which arm goes
  first alternates with the query's index, so session drift and
  order-of-execution bias cancel across the suite.

Usage:
  python tools/measure_r15.py --ab spark.sql.adaptive.coalescePartitions.minPartitionSize=64k,1m \
      [--trials N] [--sf SF_DIR] [--out FILE] [query ...]

With no query names, runs bench.py's full BENCH_QUERIES list. Writes a
JSON map {query: {"a_sec": .., "b_sec": .., "ratio": ..}} plus totals.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from securities_pricing_data_pipeline_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def _run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.agg(F.max(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()
    return time.perf_counter() - t0


def main() -> None:
    argv = sys.argv[1:]
    trials = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = "/tmp/ab_r15.json"
    ab_spec = None
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--trials":
            trials = int(argv[i + 1]); i += 2
        elif argv[i] == "--sf":
            sf_dir = argv[i + 1]; i += 2
        elif argv[i] == "--out":
            out_path = argv[i + 1]; i += 2
        elif argv[i] == "--ab":
            ab_spec = argv[i + 1]; i += 2
        else:
            names.append(argv[i]); i += 1

    key, _, vals = ab_spec.partition("=")
    val_a, val_b = vals.split(",")

    spark = get_spark("measure_r15_ab")
    queries = entry_mod.queries()
    if not names:
        names = [n for n in bench.BENCH_QUERIES if n in queries]
    for t in (
        "lineitem", "orders", "customer", "part", "supplier",
        "nation", "region", "events", "documents", "embeddings",
    ):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for idx, name in enumerate(names):
        fn = queries[name]
        try:
            _run_once(spark, fn, sf_dir)  # warm-up: silver builds, codegen
            arms = [("a", val_a), ("b", val_b)]
            if idx % 2:
                arms.reverse()
            samples: dict[str, list[float]] = {"a": [], "b": []}
            for arm, val in arms:
                spark.conf.set(key, val)
                for _ in range(trials):
                    samples[arm].append(_run_once(spark, fn, sf_dir))
            a_med = statistics.median(samples["a"])
            b_med = statistics.median(samples["b"])
            results[name] = {
                "a_sec": round(a_med, 4),
                "b_sec": round(b_med, 4),
                "ratio_b_over_a": round(b_med / a_med, 3),
                "order": "ab" if idx % 2 == 0 else "ba",
            }
            print(
                f"[{idx + 1}/{len(names)}] {name}: {val_a}={a_med:.3f}s "
                f"{val_b}={b_med:.3f}s ratio={b_med / a_med:.3f}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — isolation, like bench.py
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"{name} FAILED: {errors[name]}", flush=True)
        finally:
            spark.conf.set(key, val_a)

    tot_a = round(sum(r["a_sec"] for r in results.values()), 2)
    tot_b = round(sum(r["b_sec"] for r in results.values()), 2)
    summary = {
        "conf": key,
        "val_a": val_a,
        "val_b": val_b,
        "trials": trials,
        "sf_dir": sf_dir,
        "total_a": tot_a,
        "total_b": tot_b,
        "total_ratio_b_over_a": round(tot_b / tot_a, 4) if tot_a else None,
        "n": len(results),
        "per_query": results,
        "errors": errors,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: summary[k] for k in (
        "val_a", "val_b", "total_a", "total_b", "total_ratio_b_over_a", "n")}))


if __name__ == "__main__":
    main()
