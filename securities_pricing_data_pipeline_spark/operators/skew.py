"""Skew mitigation for hot keys (SURVEY.md §7 "100 TB posture").

A handful of symbols (index ETFs, mega-caps) dominate daily volume, so
key-hashed shuffles put a large share of rows in a few partitions. AQE's
skew-join splitting handles the join case at runtime; these helpers cover
the two patterns AQE does not:

* ``salted_aggregate`` — two-stage aggregation for *algebraic* aggregates
  (sum/count/min/max): stage 1 aggregates on (key, salt) spreading a hot
  key over N partitions, stage 2 merges the N partials per key. Total
  shuffle volume barely grows (partials are tiny) and no single task owns
  a hot key's full row set.
* ``replicated_broadcast_join`` — fallback when the build side is small
  but above the broadcast threshold on a skewed probe: salt the probe
  side with ``salt ∈ [0, n)`` and replicate the build side n times keyed
  by salt, turning one hot shuffle partition into n.

Salting is deterministic (hash of a tie-break column mod n) so re-runs
produce identical partitioning — important for the A7 idempotency
contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int, entropy_cols: Sequence[str] | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, n_salts).

    Uses xxhash64 of ``entropy_cols`` (default: all columns) — not
    ``rand()``, which breaks retry determinism and the idempotency
    contract.
    """
    cols = [F.col(c) for c in (entropy_cols or df.columns)]
    return df.withColumn(_SALT, F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
    entropy_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation robust to hot group keys.

    ``aggs`` maps output column → (input column, fn) where fn ∈
    {sum, count, min, max}. Stage 1 computes partials on (keys, salt);
    stage 2 merges partials on keys (count merges via sum).
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (_, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{out}: non-algebraic aggregate {fn!r} cannot be salted")

    salted = with_salt(df, n_salts, entropy_cols)
    partial = salted.groupBy(*keys, _SALT).agg(
        *[getattr(F, fn)(col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[getattr(F, merge_fn[fn])(out).alias(out) for out, (_, fn) in aggs.items()]
    )


def replicated_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    entropy_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join a skew-keyed big side against a small side by salting.

    The big side gets a deterministic salt; the small side is replicated
    once per salt value (explode of a 0..n-1 array — n× the small side,
    which is by assumption affordable). The join key becomes
    (on..., salt), so a hot key's rows spread over n shuffle partitions.
    """
    big_s = with_salt(big, n_salts, entropy_cols)
    small_r = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = big_s.join(small_r, [*on, _SALT], how)
    return out.drop(_SALT)
