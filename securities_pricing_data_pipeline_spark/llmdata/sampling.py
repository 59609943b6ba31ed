"""Deterministic sampling / splitting for training-data pipelines.

Random sampling is useless at 100 TB if it isn't reproducible across
re-runs and engines: ``rand()`` changes with partitioning and retries.
Everything here derives decisions from a content-stable hash of the row
key (md5 → 60-bit int, same family as ``dedup.portable_hash60``), so the
same row always lands in the same split/sample on any cluster layout —
and the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.llmdata.dedup import portable_hash60


def hash_bucket(c, buckets: int = 100):
    """Stable bucket in [0, buckets) from the md5-derived 60-bit hash of
    the column's string form. Decoupled from Spark's internal ``hash``
    (seed- and type-dependent) on purpose."""
    return portable_hash60(c.cast("string")) % buckets


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign train/val/test by hash bucket — a narrow projection (no
    shuffle, no state): re-runs, backfills, and late-arriving rows all
    split identically. Percentages are exact over the bucket space, not
    the row count (the usual contract for hash splits)."""
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def sample_fraction(df: DataFrame, id_col: str = "doc_id", pct: int = 10) -> DataFrame:
    """Keep a stable pct% sample: the filter is a pure expression, so it
    pushes into the scan and composes with partition pruning."""
    return df.filter(hash_bucket(F.col(id_col)) < pct)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: each stratum keeps its own pct
    of rows, decided by the stable hash bucket of the row id — the
    standard up/down-sampling move for balancing a training mix (e.g.
    keep 80% of English, 10% of everything else). Pure narrow filter:
    pushes into the scan, no shuffle, reproducible on any layout."""
    b = hash_bucket(F.col(id_col))
    rate = F.lit(default_pct)
    for key, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(pct)).otherwise(rate)
    return df.filter(b < rate)


def shard_plan(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus shuffle + sharding for training-data export:
    every document gets a shard in [0, n_shards) and a position within
    the shard, both derived from independent keyed hashes of its id — a
    reproducible global permutation WITHOUT a global sort. Each shard's
    ordering is a within-partition sort after one hash shuffle
    (``repartition(shard)`` + local sort on a cluster writer), so shards
    build embarrassingly parallel at any corpus size; no stage ever sees
    a total order. Ties (hash collisions) break on the id, keeping the
    permutation a function of ids alone — stable across runs, engines,
    and partition layouts.
    """
    from pyspark.sql import Window

    shard = (portable_hash60(F.concat(F.lit("shard:"), F.col(id_col).cast("string"))) % n_shards).cast("int")
    order = portable_hash60(F.concat(F.lit("order:"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("ord", id_col)
    return (
        df.select(F.col(id_col), shard.alias("shard"), order.alias("ord"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )
