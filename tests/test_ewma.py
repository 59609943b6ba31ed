"""Unit tests for the codegen lag-chain EWMA helper (_ewma_lag_terms).

The oracle gate pins q19/q24/q28 against DuckDB end-to-end; these tests
pin the helper itself against a hand-computed definitional EWMA on a
tiny series, so a future refactor of the lag chain (term order, null
handling, adaptive-denominator indexing) fails HERE with a readable
diff instead of as an opaque oracle hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.queries.serving import (
    _EWMA_DEN,
    _EWMA_W,
    _ewma_lag_terms,
)


def _reference_ewma(units: list[int], t: int) -> float:
    """Definitional trailing EWMA at row t: Σ wᵢ·c₍ₜ₋ᵢ₎ / Σ wᵢ over the
    available (≤30) trailing rows, newest-first weights."""
    avail = units[max(0, t - 29) : t + 1][::-1]
    num = sum(c * w for c, w in zip(avail, _EWMA_W))
    return num / _EWMA_DEN[len(avail) - 1]


def test_lag_chain_matches_definition(spark):
    units = [100 + 7 * i * (-1) ** i for i in range(40)]  # sign-alternating
    rows = [(1, i, u) for i, u in enumerate(units)]
    df = spark.createDataFrame(rows, "sym int, t int, cu long")
    w = Window.partitionBy("sym").orderBy("t")
    num, den = _ewma_lag_terms(F.col("cu"), w, _EWMA_W, _EWMA_DEN)
    out = (
        df.select("t", (num.cast("double") / den.cast("double")).alias("e"))
        .orderBy("t")
        .collect()
    )
    for r in out:
        assert r["e"] == _reference_ewma(units, r["t"]), f"row {r['t']}"


def test_lag_chain_leading_edge_denominators(spark):
    """Rows 0..29 must divide by the PARTIAL weight sums (adaptive leading
    edge), not the full-window denominator."""
    rows = [(1, i, 1000) for i in range(30)]  # constant series
    df = spark.createDataFrame(rows, "sym int, t int, cu long")
    w = Window.partitionBy("sym").orderBy("t")
    num, den = _ewma_lag_terms(F.col("cu"), w, _EWMA_W, _EWMA_DEN)
    out = df.select("t", (num.cast("double") / den.cast("double")).alias("e")).collect()
    # constant input → EWMA exactly equals the constant at EVERY row iff
    # the denominator tracks the available-weight sum
    assert all(r["e"] == 1000.0 for r in out)


def test_lag_chain_partition_isolation(spark):
    """Lags must not leak across symbols: two single-row partitions each
    see only themselves (den = first weight)."""
    df = spark.createDataFrame([(1, 0, 500), (2, 0, 900)], "sym int, t int, cu long")
    w = Window.partitionBy("sym").orderBy("t")
    num, den = _ewma_lag_terms(F.col("cu"), w, _EWMA_W, _EWMA_DEN)
    out = {
        r["sym"]: r["e"]
        for r in df.select(
            "sym", (num.cast("double") / den.cast("double")).alias("e")
        ).collect()
    }
    assert out == {1: 500.0, 2: 900.0}
