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


def test_q24_sql_form_matches_column_form(spark):
    """r14 pins the selectExpr-built q24_macd (driver-side build cost:
    ~700 py4j Column calls → a handful of SQL strings) against the
    original Column-API formulation, replicated here verbatim — the two
    must agree row-for-row, bit-for-bit."""
    from securities_pricing_data_pipeline_spark.queries.serving import (
        _EWMA_WIN,
        _MACD_D9,
        _MACD_D12,
        _MACD_D26,
        _MACD_W9,
        _MACD_W12,
        _MACD_W26,
        q24_macd,
    )
    from securities_pricing_data_pipeline_spark.queries.bars import bars_silver

    sf = "/root/testdata/sf0.001"
    b = bars_silver(spark, sf)
    w = Window.partitionBy("symbol").orderBy("trade_date")
    cu = (F.col("close") * 10000).cast("long")

    def lag_frame(src, col, keep):
        cols = [
            F.coalesce(
                F.lag(col, k).over(w) if k else col, F.lit(0).cast("long")
            ).alias(f"_c{k}")
            for k in range(_EWMA_WIN)
        ]
        m = F.least(F.row_number().over(w), F.lit(_EWMA_WIN)).alias("_m")
        return src.select(*keep, m, *cols)

    def dot(weights, dens):
        num = None
        for k, wt in enumerate(weights):
            t = F.col(f"_c{k}") * F.lit(wt).cast("long")
            num = t if num is None else num + t
        den = F.element_at(
            F.array(*[F.lit(d).cast("long") for d in dens]), F.col("_m")
        )
        return num.cast("double") / den.cast("double")

    stage1 = lag_frame(b, cu, ["symbol", "trade_date"]).select(
        "symbol",
        "trade_date",
        (
            (dot(_MACD_W12, _MACD_D12) - dot(_MACD_W26, _MACD_D26))
            / F.lit(10000.0)
        ).alias("macd"),
    )
    mu = F.round(F.col("macd") * 10000).cast("long")
    ref = (
        lag_frame(stage1, mu, ["symbol", "trade_date", "macd"])
        .select(
            "symbol",
            "trade_date",
            "macd",
            (dot(_MACD_W9, _MACD_D9) / F.lit(10000.0)).alias("signal"),
        )
        .select(
            "symbol",
            "trade_date",
            "macd",
            "signal",
            (F.col("macd") - F.col("signal")).alias("histogram"),
        )
    )
    got = q24_macd(spark, sf)
    assert got.columns == ref.columns
    key = lambda r: (r["symbol"], r["trade_date"])  # noqa: E731
    got_rows = sorted(got.collect(), key=key)
    ref_rows = sorted(ref.collect(), key=key)
    assert got_rows == ref_rows
