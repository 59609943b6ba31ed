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


def hll_grouped_registers(
    df: DataFrame, key: Column, groups: list[str], p: int = 8
) -> DataFrame:
    """Per-group HLL register tables: (groups..., bucket, M).

    This is the MERGEABLE form — the property that makes sketches work at
    100 TB: registers built per partition-of-the-data (per day, per
    source, per shard) are tiny (≤2^p rows each), can be persisted as a
    sketch table, and re-aggregate to any coarser grain with a plain
    ``max`` — no raw-data re-scan, ever (see :func:`hll_merge_estimate`).
    """
    m = 1 << p
    wbits = 60 - p
    h = portable_hash60(key.cast("string"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*groups, (h % F.lit(m)).alias("bucket"), rho.alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge_estimate(
    regs: DataFrame, merge_groups: list[str], p: int = 8
) -> DataFrame:
    """Merge finer-grain register tables to ``merge_groups`` grain (bucket-
    wise ``max``) and fold each merged register set to its estimate —
    same integer pipeline as :func:`hll_estimate`, per group."""
    m = 1 << p
    wbits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    merged = regs.groupBy(*merge_groups, "bucket").agg(F.max("M").alias("M"))
    agg = merged.groupBy(*merge_groups).agg(
        F.count("*").alias("n_buckets_seen"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), greatest({wbits} - M, 0))")
        ).alias("s_seen"),
    )
    zeros = F.lit(m) - F.col("n_buckets_seen")
    s_scaled = F.col("s_seen") + zeros * F.lit(1 << wbits).cast("long")
    est = F.lit(alpha * m * m * float(1 << wbits)) / s_scaled.cast("double")
    return agg.select(
        *merge_groups,
        s_scaled.cast("long").alias("s_scaled"),
        est.alias("hll_estimate"),
    )


def hll_merge_oracle_sql(
    table: str,
    key_expr: str,
    fine_expr: str,
    merge_expr: str,
    merge_name: str = "mg",
    p: int = 8,
) -> str:
    """DuckDB twin of grouped registers → merged estimate: build
    registers at (``merge_expr``, ``fine_expr``) grain, merge to
    ``merge_expr`` with a bucket-wise max, fold to the estimate."""
    m = 1 << p
    wbits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return f"""
WITH h AS (
  SELECT {merge_expr} AS mg, {fine_expr} AS fg,
         CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM {table}
), regs AS (
  SELECT mg, fg, hv % {m} AS bucket,
         MAX(CASE WHEN (hv >> {p}) = 0 THEN {wbits + 1}
                  ELSE {wbits + 1} - length(bin(hv >> {p})) END) AS M
  FROM h GROUP BY 1, 2, 3
), merged AS (
  SELECT mg, bucket, MAX(M) AS M FROM regs GROUP BY 1, 2
), agg AS (
  SELECT mg, COUNT(*) AS n_buckets_seen,
         CAST(SUM(CAST(1 AS BIGINT) << greatest({wbits} - M, 0)) AS BIGINT) AS s_seen
  FROM merged GROUP BY 1
)
SELECT mg AS {merge_name},
       CAST(s_seen + ({m} - n_buckets_seen) * (CAST(1 AS BIGINT) << {wbits}) AS BIGINT)
         AS s_scaled,
       {alpha * m * m * float(1 << wbits)!r} / CAST(
         s_seen + ({m} - n_buckets_seen) * (CAST(1 AS BIGINT) << {wbits}) AS DOUBLE)
         AS hll_estimate
FROM agg
"""


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


def bloom_words(df: DataFrame, key: Column, k: int = 3, m_bits: int = 4096) -> DataFrame:
    """Portable Bloom filter (Bloom 1970): ``m_bits`` bits packed into
    32-bit words (word = pos DIV 32, mask = 1 << (pos % 32) — 32-bit words
    so no engine ever shifts into a sign bit), positions from the same
    md5-derived hash family as the HLL/CMS (hash of ``'i:' || key``).

    Build cost: one explode (k rows per input) + one hash aggregate with
    ``bit_or`` — map-side combine collapses to ≤ m_bits/32 rows per
    partition, so the exchange carries kilobytes at any scale. Mergeable
    by word-wise OR."""
    ks = key.cast("string")
    pos = F.explode(
        F.array(
            *[
                (portable_hash60(F.concat(F.lit(f"{i}:"), ks)) % F.lit(m_bits)).alias("p")
                for i in range(k)
            ]
        )
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 32).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe_summary(
    build: DataFrame,
    build_key: Column,
    probes: DataFrame,
    probe_key: Column,
    k: int = 3,
    m_bits: int = 4096,
) -> DataFrame:
    """Membership probe with ground truth: one row — probe count, Bloom
    'maybe' count, exact present count, and false positives (maybe −
    present; never negative: Bloom has no false negatives). The filter
    (≤ m_bits/32 rows) broadcasts onto the probe side; the exact check is
    a distinct-key semi-style left join kept here to EXPOSE the FP rate —
    production reads the sketch alone."""
    bloom = bloom_words(build, build_key, k=k, m_bits=m_bits)
    pk = probe_key.cast("string")
    pr = probes.select(pk.alias("pkey")).distinct()
    pos = pr.select(
        "pkey",
        F.explode(
            F.array(
                *[
                    (portable_hash60(F.concat(F.lit(f"{i}:"), F.col("pkey"))) % F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("pos"),
    ).select(
        "pkey",
        (F.col("pos") / 32).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
    )
    hits = (
        pos.join(F.broadcast(bloom), "word", "left")
        .select(
            "pkey",
            ((F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))) == F.col("mask"))
            .cast("int")
            .alias("bit_set"),
        )
        .groupBy("pkey")
        .agg((F.sum("bit_set") == k).cast("int").alias("maybe"))
    )
    present = build.select(build_key.cast("string").alias("pkey")).distinct().withColumn(
        "is_present", F.lit(1)
    )
    flagged = hits.join(present, "pkey", "left").select(
        "maybe", F.coalesce("is_present", F.lit(0)).alias("is_present")
    )
    return flagged.agg(
        F.count("*").alias("n_probes"),
        F.sum("maybe").alias("n_maybe"),
        F.sum("is_present").alias("n_present"),
        F.sum(
            (F.col("maybe").cast("int") - F.col("is_present")).cast("long")
        ).alias("n_false_positives"),
    )


def bloom_oracle_sql(
    build_table: str,
    build_key: str,
    probe_table: str,
    probe_key: str,
    k: int = 3,
    m_bits: int = 4096,
) -> str:
    """DuckDB twin of :func:`bloom_probe_summary` — same hash family,
    same 32-bit word packing."""
    def hsh(expr: str) -> str:
        return (
            "CAST(('0x' || substr(md5(CAST(di.i AS VARCHAR) || ':' || "
            f"{expr}), 1, 15)) AS BIGINT) % {m_bits}"
        )

    return f"""
WITH depths AS (
  SELECT unnest(range({k})) AS i
), bloom AS (
  SELECT pos // 32 AS word, bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
  FROM (
    SELECT {hsh(f"CAST(b.{build_key} AS VARCHAR)")} AS pos
    FROM {build_table} b, depths di
  )
  GROUP BY 1
), probes AS (
  SELECT DISTINCT CAST({probe_key} AS VARCHAR) AS pkey FROM {probe_table}
), ppos AS (
  SELECT p.pkey, {hsh("p.pkey")} AS pos
  FROM probes p, depths di
), hits AS (
  SELECT pkey,
         CAST(CASE WHEN SUM(CASE WHEN (COALESCE(bl.bits, 0) & (CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)))
                                      = (CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))
                                 THEN 1 ELSE 0 END) = {k}
                   THEN 1 ELSE 0 END AS INT) AS maybe
  FROM (SELECT pkey, pos, pos // 32 AS word FROM ppos) pp
  LEFT JOIN bloom bl USING (word)
  GROUP BY pkey
), truth AS (
  SELECT DISTINCT CAST({build_key} AS VARCHAR) AS pkey, 1 AS is_present
  FROM {build_table}
)
SELECT COUNT(*) AS n_probes,
       CAST(SUM(maybe) AS BIGINT) AS n_maybe,
       CAST(SUM(COALESCE(is_present, 0)) AS BIGINT) AS n_present,
       CAST(SUM(maybe - COALESCE(is_present, 0)) AS BIGINT) AS n_false_positives
FROM hits LEFT JOIN truth USING (pkey)
"""


# ---------------------------------------------------------------------------
# Histogram quantile sketch: the mergeable answer to percentiles at scale.
# Exact percentiles need a full sort (or a per-group collect); a fixed-grid
# histogram needs ONE hash aggregate whose map-side combine reduces every
# partition to <= n_buckets rows per group, merges by addition (same
# algebra as operators.incremental), and answers any quantile from the
# cumulative counts with error bounded by one bucket width. All arithmetic
# is engine-stable: the bucket index is floor(val/width) on doubles with a
# binary-exact width, counts are integers, and the estimate is the bucket
# lower edge (no interpolation, no float accumulation).
# ---------------------------------------------------------------------------


def quantile_histogram(
    df: DataFrame,
    val: Column,
    groups: list[str],
    lo: float,
    hi: float,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-group fixed-grid bucket counts: (groups..., bucket, cnt).

    Mergeable by addition across finer partitions (days, shards) — the
    histogram twin of :func:`hll_grouped_registers`. Values outside
    [lo, hi) clamp to the edge buckets.
    """
    width = (hi - lo) / n_buckets
    b = F.floor((val.cast("double") - F.lit(lo)) / F.lit(width)).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1))
    return (
        df.select(*groups, b.alias("bucket"))
        .groupBy(*groups, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def quantiles_from_histogram(
    hist: DataFrame,
    groups: list[str],
    qs: dict[str, float],
    lo: float,
    hi: float,
    n_buckets: int = 256,
) -> DataFrame:
    """Fold per-group histograms to quantile estimates: for each named
    quantile, the lower edge of the first bucket whose cumulative count
    reaches q·n. One window over ≤``n_buckets`` rows per group, then one
    conditional min per quantile."""
    from pyspark.sql import Window

    width = (hi - lo) / n_buckets
    w = (
        Window.partitionBy(*groups)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*groups))
    )
    aggs = [F.max("n").cast("long").alias("n_values")] + [
        (
            F.lit(lo)
            + F.min(
                F.when(F.col("cum") >= F.lit(q) * F.col("n"), F.col("bucket"))
            ).cast("double")
            * F.lit(width)
        ).alias(name)
        for name, q in qs.items()
    ]
    return c.groupBy(*groups).agg(*aggs)


def quantile_histogram_oracle_sql(
    table_expr: str,
    val_expr: str,
    group_expr: str,
    group_name: str,
    qs: dict[str, float],
    lo: float,
    hi: float,
    n_buckets: int = 256,
) -> str:
    """DuckDB twin: identical bucket/cumulative/threshold arithmetic."""
    width = (hi - lo) / n_buckets
    q_cols = ",\n       ".join(
        f"{lo!r} + CAST(MIN(CASE WHEN cum >= {q!r} * n THEN bucket END) AS DOUBLE)"
        f" * {width!r} AS {name}"
        for name, q in qs.items()
    )
    return f"""
WITH pts AS (
  SELECT {group_expr} AS g,
         least(greatest(CAST(floor((CAST({val_expr} AS DOUBLE) - {lo!r}) / {width!r})
                        AS INT), 0), {n_buckets - 1}) AS bucket
  FROM {table_expr}
), hist AS (
  SELECT g, bucket, COUNT(*) AS cnt FROM pts GROUP BY 1, 2
), c AS (
  SELECT g, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY g ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY g) AS n
  FROM hist
)
SELECT g AS {group_name},
       CAST(MAX(n) AS BIGINT) AS n_values,
       {q_cols}
FROM c
GROUP BY g
"""
