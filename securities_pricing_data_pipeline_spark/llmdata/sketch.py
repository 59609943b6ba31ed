"""Distinct-count sketching (HyperLogLog) as pure Catalyst expressions.

Spark ships HLL++ (``approx_count_distinct``), but its register layout is
engine-internal — useless when sketches must be exchanged with other
systems or verified externally. This is the classic Flajolet HLL re-built
on the engine's portable md5-derived hash, so registers (and therefore
estimates) are bit-reproducible anywhere that can run SQL:

  * bucket   = low ``p`` bits of the 60-bit portable hash;
  * rho      = leading-zero rank of the remaining ``60-p`` bits + 1,
               computed via ``length(bin(w))`` — integer-only, no log2
               float boundary risk;
  * register = ``max(rho)`` per bucket — one tiny hash aggregate whose
               map-side combine reduces each partition to ≤2^p rows, the
               whole point of sketching at 100 TB;
  * Σ 2^-M   summed as exact integers scaled by 2^(61-p) (bit shifts, no
               float accumulation), so the final double division is the
               ONLY floating-point step and is IEEE-identical everywhere.

The small-range linear-counting correction (E < 2.5m, V > 0) is left to
the caller — it needs ``ln``, whose last-bit behavior is libm-specific,
and this module's contract is bit-reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.llmdata.dedup import portable_hash60


def hll_estimate(df: DataFrame, key: Column, p: int = 8) -> DataFrame:
    """One-row frame: (m, n_zero_buckets, s_scaled, hll_estimate).

    ``s_scaled`` is Σ_b 2^(wbits - M_b) over all 2^p buckets (absent
    buckets contribute 2^wbits), an exact BIGINT; the estimate is
    alpha_m · m² · 2^wbits / s_scaled in double.
    """
    m = 1 << p
    wbits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard HLL bias constant, m ≥ 128

    h = portable_hash60(key.cast("string"))
    bucket = (h % F.lit(m)).alias("bucket")
    # bit-shift, not '/', which would round-trip through double past 2^53
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))

    regs = df.select(bucket, rho.alias("rho")).groupBy("bucket").agg(F.max("rho").alias("M"))
    # M can reach wbits+1 (all-zero suffix, hash < 2^p), making the exponent
    # -1: Spark masks shift counts to 63 (silent Long.MIN_VALUE), DuckDB
    # raises. Clamp to 0 in BOTH engines — that bucket contributes 1 instead
    # of the true ½ grid unit, a half-unit overstatement of s_scaled with
    # probability ~2^-(60-p) per row, identical (hence still bit-reproducible)
    # everywhere.
    agg = regs.agg(
        F.count("*").alias("n_buckets_seen"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), greatest({wbits} - M, 0))")).alias("s_seen"),
    )
    zeros = F.lit(m) - F.col("n_buckets_seen")
    s_scaled = F.col("s_seen") + zeros * F.lit(1 << wbits).cast("long")
    est = F.lit(alpha * m * m * float(1 << wbits)) / s_scaled.cast("double")
    return agg.select(
        F.lit(m).alias("m"),
        zeros.cast("long").alias("n_zero_buckets"),
        s_scaled.cast("long").alias("s_scaled"),
        est.alias("hll_estimate"),
    )


def hll_oracle_sql(table: str, key_expr: str, p: int = 8) -> str:
    """DuckDB twin of :func:`hll_estimate` — literally the same integer
    pipeline, emitted as SQL text."""
    m = 1 << p
    wbits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return f"""
WITH h AS (
  SELECT CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM {table}
), regs AS (
  SELECT hv % {m} AS bucket,
         MAX(CASE WHEN (hv >> {p}) = 0 THEN {wbits + 1}
                  ELSE {wbits + 1} - length(bin(hv >> {p})) END) AS M
  FROM h GROUP BY 1
), agg AS (
  SELECT COUNT(*) AS n_buckets_seen,
         CAST(SUM(CAST(1 AS BIGINT) << greatest({wbits} - M, 0)) AS BIGINT) AS s_seen
  FROM regs
)
SELECT {m} AS m,
       CAST({m} - n_buckets_seen AS BIGINT) AS n_zero_buckets,
       CAST(s_seen + ({m} - n_buckets_seen) * (CAST(1 AS BIGINT) << {wbits}) AS BIGINT)
         AS s_scaled,
       {alpha * m * m * float(1 << wbits)!r} / CAST(
         s_seen + ({m} - n_buckets_seen) * (CAST(1 AS BIGINT) << {wbits}) AS DOUBLE)
         AS hll_estimate
FROM agg
"""


def cms_table(df: DataFrame, key: Column, d: int = 4, w: int = 256) -> DataFrame:
    """Portable count-min sketch (Cormode & Muthukrishnan 2005): the
    (depth, bucket) → count table, built from the same md5-derived hash
    family as the HLL so any SQL engine reproduces every cell exactly
    (row i hashes ``'i:' || key``).

    One explode (d rows per input) + one hash aggregate; map-side combine
    collapses to ≤ d·w rows per partition, so at 100 TB the exchange
    carries kilobytes. The sketch is mergeable by cell-wise addition —
    the property that makes it the streaming/x-system frequency sketch.
    """
    ks = key.cast("string")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    (portable_hash60(F.concat(F.lit(f"{i}:"), ks)) % F.lit(w)).alias(
                        "bucket"
                    ),
                )
                for i in range(d)
            ]
        )
    ).alias("c")
    return (
        df.select(cells)
        .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate_topk(
    df: DataFrame, key: Column, k: int = 10, d: int = 4, w: int = 256
) -> DataFrame:
    """Heavy-hitter check: exact top-k keys by frequency, each with its
    count-min estimate (min over the d rows — always ≥ truth). The CMS is
    d·w rows, broadcast onto the probe set; the only full-data passes are
    the sketch build and the exact count (kept here to EXPOSE the
    estimation error; production reads the sketch alone)."""
    ks = key.cast("string")
    cms = cms_table(df, key, d=d, w=w)
    probes = (
        df.select(ks.alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "k")
        .limit(k)
    )
    probed = probes.select(
        "k",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (
                            portable_hash60(F.concat(F.lit(f"{i}:"), F.col("k")))
                            % F.lit(w)
                        ).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("c"),
    ).select("k", "true_cnt", F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
    return (
        probed.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("k", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_oracle_sql(table: str, key_expr: str, k: int = 10, d: int = 4, w: int = 256) -> str:
    """DuckDB twin of :func:`cms_estimate_topk` — same hash family, same
    integer pipeline."""
    hash_sql = (
        "CAST(('0x' || substr(md5(CAST(di.i AS VARCHAR) || ':' || s.k), 1, 15)) "
        f"AS BIGINT) % {w}"
    )
    return f"""
WITH src AS (
  SELECT CAST({key_expr} AS VARCHAR) AS k FROM {table}
), depths AS (
  SELECT unnest(range({d})) AS i
), cms AS (
  SELECT di.i, {hash_sql} AS bucket, COUNT(*) AS cnt
  FROM src s, depths di
  GROUP BY 1, 2
), probes AS (
  SELECT k, COUNT(*) AS true_cnt FROM src GROUP BY k
  ORDER BY true_cnt DESC, k LIMIT {k}
)
SELECT s.k, s.true_cnt, MIN(c.cnt) AS cms_est
FROM (SELECT p.k AS k, p.true_cnt,
             di.i AS i,
             CAST(('0x' || substr(md5(CAST(di.i AS VARCHAR) || ':' || p.k), 1, 15))
                  AS BIGINT) % {w} AS bucket
      FROM probes p, depths di) s
JOIN cms c ON c.i = s.i AND c.bucket = s.bucket
GROUP BY 1, 2
"""
