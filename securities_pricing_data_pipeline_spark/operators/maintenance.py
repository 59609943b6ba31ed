"""Table maintenance: small-file compaction for parquet directories.

Streaming ingests and per-date upserts (plans/pipeline.py writes one
partition per trade_date) accumulate many small files; at cluster scale
small files dominate job overhead (one task + one footer read each) and
crush the name node / listing path. This operator rewrites a directory
(or one partition of it) into ~target-sized files — the engine-level
equivalent of Delta OPTIMIZE, built from plain Spark primitives:

  * size the output by BYTES, not file count: ceil(input_bytes/target)
    — row counts lie when row width varies;
  * `coalesce` (narrow, no shuffle) unless an optional sort is
    requested, in which case `repartitionByRange` + sortWithinPartitions
    produces clustered files whose row-group min/max stats actually
    prune (the poor man's Z-order for one key);
  * write to a sibling temp dir, then atomically swap via rename — a
    reader never observes a half-compacted directory.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    max_files: int = 10000,
) -> int:
    """Rewrite ``path`` into ceil(size/target) parquet files; returns the
    new file count. With ``sort_cols``, files are range-clustered on those
    columns so min/max row-group stats become selective."""
    df = spark.read.parquet(path)
    # bound the fan-out: a tiny target on a big directory must not plan
    # millions of shuffle partitions (each empty partition still costs a task)
    n_out = min(max(1, math.ceil(dir_bytes(path) / target_bytes)), max_files)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.coalesce(n_out)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
