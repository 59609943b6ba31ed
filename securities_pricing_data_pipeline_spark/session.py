"""SparkSession factory with the engine's pinned semantics.

Pins (per SURVEY.md §2.7 semantics deltas):
  * session time zone UTC — date extraction (``dayofweek``, ``weekofyear``,
    ``date_format``) must be stable regardless of host TZ;
  * AQE on — runtime re-planning (coalesce post-shuffle partitions,
    skew-join splitting, dynamic broadcast) is the scale posture;
  * Arrow on — every pandas-UDF boundary is Arrow-batched;
  * shuffle partitions sized for the local harness but overridable via
    ``SPARK_GRAFT_CPUS`` — on a real cluster this would be set to
    ~2–3× total executor cores (or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "securities_pricing_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the pinned SparkSession.

    Local default is ``local[$SPARK_GRAFT_CPUS]`` (falls back to ``local[*]``).
    On a cluster, pass ``master=None`` with ``spark.master`` preconfigured, or
    an explicit master URL.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r15 (VERDICT r14 item 1): the r14 session-wide 64k
        # minPartitionSize floor is REVERTED to Spark's 1m default. The
        # r15 same-session paired A/B (44 queries × 3 trials per arm,
        # arm order alternated; table committed in OPTIMIZATION_r15.md)
        # showed the floor costs 12% net at local[32] — it inflates
        # post-AQE task counts on every small shuffle in the suite
        # (stream_dedup_incremental 26.2s@64k vs 13.8s@1m, the langid
        # family ~0.7x, matching the driver's 8-core-beats-32-core
        # inversion on untouched queries). The window-family wins the
        # floor bought in r14 (q24/q18/q19/q28) are kept STRUCTURALLY
        # instead: the bars silver is persisted hash-partitioned by
        # symbol (queries/bars.py), so those queries no longer have a
        # small shuffle to under-coalesce. Env knob kept for A/Bs.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "1m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata `events.ts` is parquet TIMESTAMP(NANOS): read as long
        # (epoch nanos) — ordering-compatible with the ns timestamp
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # per-trade-date partition rewrite is the engine's MERGE substitute:
        # only partitions present in the written frame are replaced
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # parquet scans: vectorized reader + filter/column pushdown are on by
        # default; keep file splitting sized so sf0.1 local runs don't create
        # thousands of tiny tasks
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # answer bare MIN/MAX/COUNT from parquet footer statistics instead
        # of scanning row groups (runtime bloom filters and dynamic
        # partition pruning are already on by default in Spark 4)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
