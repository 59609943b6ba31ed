"""Event-stream operators in their batch form (same plans the streaming
layer uses via foreachBatch / identical window expressions), each with a
DuckDB oracle. ``events.ts`` arrives as epoch-nanos long (see session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.queries.helpers import dsum, load

_GAP_NS = 30 * 60 * 1_000_000_000  # 30-minute session gap


def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (streaming twin:
    streaming.ingest.windowed_event_stats_stream)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return (
        ev.groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, batch form: flag rows that open a session
    (gap > 30 min), cumulative-sum the flags per user, aggregate per
    session. Streaming twin: streaming.stateful.sessionize_stream."""
    ev = load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, 0)
    flagged = ev.withColumn(
        "new_session",
        F.when(F.col("ts") - F.lag("ts").over(w_order) > F.lit(_GAP_NS), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w_cum))
    return flagged.groupBy("user_id", F.col("session_id").cast("int").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.expr("min(ts) div 1000000000").alias("session_start_epoch"),
        F.expr("max(ts) div 1000000000").alias("session_end_epoch"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
    )


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via the BUILT-IN ``session_window``
    aggregate (the lag-cumsum formulation above predates it; both ship so
    the plans can be compared — session_window is one hash aggregate with
    session merging inside the state manager, no window function at all,
    and is the same operator Structured Streaming uses for streaming
    sessions). Semantics delta vs the lag variant: a gap EQUAL to the
    threshold starts a new session (windows are half-open
    [start, last+gap)); timestamps are micros here (nanos div 1000), so
    the oracle mirrors >= on micros."""
    ev = load(spark, sf_dir, "events").withColumn(
        "ev_time", F.expr("timestamp_micros(ts div 1000)")
    )
    return (
        ev.groupBy("user_id", F.session_window("ev_time", "30 minutes").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").cast("long").alias("session_start_epoch"),
            F.col("sw.end").cast("long").alias("session_end_epoch"),
            "n_events",
            "total_value",
        )
    )


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: extract a typed field from the ``props``
    JSON string per row (``get_json_object`` — JVM-side JSON path eval,
    no UDF) and aggregate it per event type. At scale prefer parsing once
    with an explicit schema (``from_json``) at silver write so gold reads
    never re-parse strings."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("total_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType surface: ``parse_json`` once into a variant
    column, then typed path extraction with ``variant_get`` /
    ``try_variant_get`` — the open-schema alternative to
    ``get_json_object`` string re-parsing (variant stores a parsed binary
    encoding, so repeated field reads skip the JSON tokenizer; at silver
    scale you parse once at write and every gold read is a cheap path
    probe). Missing paths surface as NULLs via try_variant_get, counted
    per event type."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    missing = F.try_variant_get(v, "$.retries", "long")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("total_k"),
            F.count("m").alias("n_with_retries"),
        )
        .orderBy("event_type")
    )


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention without a self-join: dedup to (user, day) —
    map-side combine shrinks this to |users|×|days| rows — then a per-user
    ``lag`` marks days whose predecessor was also active, and one aggregate
    counts active vs retained users per day. The self-join formulation would
    shuffle the full event table twice; this shuffles the deduped frame
    once on user_id, once on day."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.expr("ts div 86400000000000").cast("long").alias("day")
    ).distinct()
    prev = F.lag("day").over(Window.partitionBy("user_id").orderBy("day"))
    seq = ud.withColumn("retained", (prev == F.col("day") - 1).cast("int"))
    return (
        seq.groupBy("day")
        .agg(
            F.count("*").alias("active_users"),
            F.sum(F.coalesce("retained", F.lit(0))).alias("retained_users"),
        )
        .select(
            F.col("day").alias("day_epoch_days"),
            "active_users",
            F.col("retained_users").cast("long").alias("retained_users"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase: three stacked unbounded windows
    on the same user partitioning (one shuffle — Catalyst chains the Window
    nodes), each stage a conditional MIN gated on the previous stage's
    timestamp, then a single global count of users per stage."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")), F.col("ts"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")), F.col("ts")
            )
        ).over(w),
    )
    # stage timestamps are constant per user: collapse to one row per user
    # (reuses the window's user_id partitioning — no extra exchange) so the
    # final count needs no DISTINCT (which would Expand 3× the event rows)
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"),
    )


#: window-funnel completion bound: the whole chain must finish within 7
#: days of step 1 (epoch-nanos, matching the ts contract)
_FUNNEL_WINDOW_NS = 7 * 86_400_000_000_000


def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded window funnel (ClickHouse ``windowFunnel`` shape):
    per user, the deepest view→click→purchase level reached where every
    later step lands AFTER the previous step and WITHIN 7 days of step 1
    — then a histogram of users per level. The unbounded variant is
    ``events_funnel``; the bound is what product analytics actually asks
    ("converted within a week"), and it changes the algebra: each stage's
    conditional MIN gains the step-1 deadline predicate.

    Same one-shuffle shape as the unbounded funnel: three chained
    conditional-MIN windows on one user partitioning, a per-user
    collapse reusing that partitioning, then a ≤4-row histogram."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    deadline = F.col("t_view") + F.lit(_FUNNEL_WINDOW_NS)
    s1 = ev.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view"))
                & (F.col("ts") <= deadline),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click"))
                & (F.col("ts") <= deadline),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    level = (
        F.when(F.col("t_purchase").isNotNull(), F.lit(3))
        .when(F.col("t_click").isNotNull(), F.lit(2))
        .when(F.col("t_view").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        per_user.select(level.alias("level"))
        .groupBy("level")
        .agg(F.count("*").alias("n_users"))
        .orderBy("level")
    )


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention MATRIX (cohort week x weeks-since-signup), the
    product-analytics complement to day-over-day ``events_retention``:
    users are anchored to the week of their first ``signup`` event, every
    (user, active-week) pair comes from ONE distinct over the event scan
    (map-side combine shrinks it to |users|x|weeks|), and the matrix cell
    is the share of the cohort active at that offset.

    Shape: two aggregates over the scan (first-signup per user; distinct
    user-week), one user-keyed join, one (cohort, offset) aggregate, and
    a broadcast of the tiny per-cohort sizes — no self-join of the event
    table against itself per offset (the naive formulation shuffles the
    fact table once PER matrix column)."""
    ev = load(spark, sf_dir, "events")
    week = F.expr("ts div 604800000000000").cast("long")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(week).alias("cohort_week"))
    )
    active = ev.select("user_id", week.alias("week")).distinct()
    cells = (
        active.join(signup, "user_id")
        .filter(F.col("week") >= F.col("cohort_week"))
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    sizes = signup.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias("pct_active"),
    )


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the per-user event
    stream: P(next = to | current = from), estimated from consecutive
    event pairs (lead() on one user-keyed sort — the same single shuffle
    the sessionizers use). The row-normalizing totals are transition-
    matrix-sized (|types|²→|types|), so they broadcast back; the division
    is the only float op and both engines compute it identically."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    trans = (
        ev.withColumn("to_type", nxt)
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return trans.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("p"),
    )


#: censoring horizon: users whose last event is within this of the corpus
#: end are "still alive" (censored), not churned
_KM_CENSOR_NS = 7 * 86_400_000_000_000


def events_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (first event → last
    event, churned iff the last event precedes the corpus end by more
    than 7 days; later last-events are right-CENSORED — the defining
    feature that makes this K-M rather than a plain duration histogram).

    All risk-set math is integer (durations in whole days, counts), so
    n_at_risk and n_churned hash-compare exactly. The survival product
    ∏(1 − dᵢ/nᵢ) is computed as exp(Σ ln(·)) under one cumulative window
    over the (tiny, duration-grained) life table and snapped to a 1e-12
    decimal grid — ln/exp are libm (not exact-rounded), the snap absorbs
    their last-ULP spread, same discipline as the drift monitor.

    Shape: one per-user aggregate over the scan, then every later step is
    life-table-sized (≤ max-duration rows)."""
    ev = load(spark, sf_dir, "events")
    gmax = ev.agg(F.max("ts").alias("gmax"))
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    pu = per_user.crossJoin(F.broadcast(gmax)).select(
        F.expr("(t1 - t0) div 86400000000000").cast("long").alias("duration_days"),
        (F.col("t1") < F.col("gmax") - F.lit(_KM_CENSOR_NS)).cast("int").alias("churned"),
    )
    total = pu.agg(F.count("*").alias("n_total"))
    life = pu.groupBy("duration_days").agg(
        F.count("*").alias("n_ending"),
        F.sum("churned").alias("n_churned"),
    )
    w_prev = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = life.crossJoin(F.broadcast(total)).withColumn(
        "n_at_risk",
        F.col("n_total") - F.coalesce(F.sum("n_ending").over(w_prev), F.lit(0)),
    )
    # Guard the ln(0) edge: a row where every at-risk user churns makes
    # 1 − d/n = 0 — Spark's window SUM would skip the NULL ln while
    # DuckDB raises, so both engines instead flag the row and pin
    # survival to exactly 0.0 from that duration onward (the true K-M
    # value once the risk set is extinguished).
    extinct = F.col("n_churned") >= F.col("n_at_risk")
    log_term = F.when(
        extinct, F.lit(None).cast("double")
    ).otherwise(
        F.log(
            F.lit(1.0)
            - F.col("n_churned").cast("double") / F.col("n_at_risk").cast("double")
        )
    )
    survival = F.when(
        F.sum(extinct.cast("int")).over(w_cum) > 0, F.lit(0.0)
    ).otherwise(
        F.exp(F.sum(log_term).over(w_cum)).cast("decimal(20,12)").cast("double")
    )
    return risk.select(
        "duration_days",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("n_churned").cast("long").alias("n_churned"),
        survival.alias("survival"),
    )


def events_gap_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event time distribution: exact quartiles of the gap between
    consecutive events of the same user, grouped by the type of the
    FIRST event in each pair — the latency fingerprint engagement teams
    read next to DAU/WAU. Gaps are exact integer MICROSECONDS (ns DIV
    1000 — dividing first keeps every value and every dyadic quartile
    interpolation term well under 2^53, where raw-ns corpus-span gaps
    would not be exactly representable); ``percentile`` at dyadic
    fractions then matches DuckDB's quantile_cont bitwise (the
    percentile_quantity_exact discipline). Output seconds are one float
    division per value. Plan: one user-keyed window for the lag, one
    hash aggregate per event_type."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt_ts = F.lead("ts").over(w)
    gaps = (
        ev.withColumn("gap_ns", nxt_ts - F.col("ts"))
        .filter(F.col("gap_ns").isNotNull())
        .select("event_type", F.expr("gap_ns div 1000").alias("gap_us"))
    )
    agg = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.percentile(F.col("gap_us"), F.lit(0.25)).alias("p25"),
        F.percentile(F.col("gap_us"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("gap_us"), F.lit(0.75)).alias("p75"),
    )
    return agg.select(
        "event_type",
        "n_gaps",
        (F.col("p25") / 1000000.0).alias("gap_p25_s"),
        (F.col("p50") / 1000000.0).alias("gap_p50_s"),
        (F.col("p75") / 1000000.0).alias("gap_p75_s"),
    )


QUERIES = {
    "events_hourly_stats": events_hourly_stats,
    "events_gap_quartiles": events_gap_quartiles,
    "events_sessionize": events_sessionize,
    "events_session_window": events_session_window,
    "events_json_props": events_json_props,
    "events_variant_props": events_variant_props,
    "events_retention": events_retention,
    "events_funnel": events_funnel,
    "events_window_funnel": events_window_funnel,
    "events_cohort_retention": events_cohort_retention,
    "events_markov_transitions": events_markov_transitions,
    "events_km_survival": events_km_survival,
}

ORACLES = {
    "events_gap_quartiles": """
WITH gaps AS (
  SELECT event_type,
         (lead(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          - epoch_ns(ts)) // 1000 AS gap_us
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_gaps,
       quantile_cont(gap_us, 0.25) / 1000000.0 AS gap_p25_s,
       quantile_cont(gap_us, 0.5)  / 1000000.0 AS gap_p50_s,
       quantile_cont(gap_us, 0.75) / 1000000.0 AS gap_p75_s
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY 1
""",
    "events_hourly_stats": """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
         AS window_start_epoch,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    "events_sessionize": """
WITH flagged AS (
  SELECT user_id, event_id, epoch_ns(ts) AS tns, value,
         CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, value, tns,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS INT) AS session_id,
       COUNT(*) AS n_events,
       CAST(MIN(tns) // 1000000000 AS BIGINT) AS session_start_epoch,
       CAST(MAX(tns) // 1000000000 AS BIGINT) AS session_end_epoch,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY 1, 2
""",
    "events_session_window": """
WITH m AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS mts, value FROM events
), flagged AS (
  SELECT user_id, mts, value,
         CASE WHEN mts - lag(mts) OVER w >= 1800000000 OR lag(mts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM m
  WINDOW w AS (PARTITION BY user_id ORDER BY mts)
), sess AS (
  SELECT user_id, mts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY mts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(mts) // 1000000 AS session_start_epoch,
       (MAX(mts) + 1800000000) // 1000000 AS session_end_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, sid
""",
    "events_variant_props": """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS total_k,
       COUNT(CAST(props->>'retries' AS BIGINT)) AS n_with_retries
FROM events GROUP BY 1 ORDER BY 1
""",
    "events_json_props": """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
    "events_retention": """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
  FROM events
), seq AS (
  SELECT day,
         CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) = day - 1
              THEN 1 ELSE 0 END AS retained
  FROM ud
)
SELECT day AS day_epoch_days,
       COUNT(*) AS active_users,
       CAST(SUM(retained) AS BIGINT) AS retained_users
FROM seq
GROUP BY day
""",
    "events_km_survival": """
WITH gm AS (
  SELECT MAX(epoch_ns(ts)) AS gmax FROM events
), pu AS (
  SELECT (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts))) // 86400000000000 AS duration_days,
         CASE WHEN MAX(epoch_ns(ts)) < (SELECT gmax FROM gm) - 604800000000000 THEN 1 ELSE 0 END AS churned
  FROM events GROUP BY user_id
), total AS (
  SELECT COUNT(*) AS n_total FROM pu
), life AS (
  SELECT duration_days, COUNT(*) AS n_ending, CAST(SUM(churned) AS BIGINT) AS n_churned
  FROM pu GROUP BY 1
), risk AS (
  SELECT duration_days, n_ending, n_churned,
         (SELECT n_total FROM total)
           - COALESCE(SUM(n_ending) OVER (ORDER BY duration_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
  FROM life
)
SELECT CAST(duration_days AS BIGINT) AS duration_days,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       n_churned,
       -- ln(0) guard mirroring the Spark side: once a row extinguishes its
       -- risk set (n_churned >= n_at_risk), survival is exactly 0.0 onward
       CASE WHEN SUM(CASE WHEN n_churned >= n_at_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY duration_days
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
            THEN 0.0
            ELSE CAST(CAST(exp(SUM(CASE WHEN n_churned >= n_at_risk THEN NULL
                                        ELSE ln(1.0 - CAST(n_churned AS DOUBLE)
                                                / CAST(n_at_risk AS DOUBLE)) END)
                     OVER (ORDER BY duration_days
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 AS DECIMAL(20,12)) AS DOUBLE)
       END AS survival
FROM risk
""",
    "events_markov_transitions": """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), trans AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY 1, 2
), totals AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM trans GROUP BY 1
)
SELECT t.from_type, t.to_type, t.n,
       CAST(t.n AS DOUBLE) / CAST(z.tot AS DOUBLE) AS p
FROM trans t JOIN totals z USING (from_type)
""",
    "events_cohort_retention": """
WITH ev AS (
  SELECT user_id, event_type, epoch_ns(ts) // 604800000000000 AS week FROM events
), signup AS (
  SELECT user_id, MIN(week) AS cohort_week FROM ev
  WHERE event_type = 'signup' GROUP BY 1
), active AS (
  SELECT DISTINCT user_id, week FROM ev
), cells AS (
  SELECT s.cohort_week, a.week - s.cohort_week AS week_offset,
         COUNT(*) AS n_active
  FROM active a JOIN signup s USING (user_id)
  WHERE a.week >= s.cohort_week
  GROUP BY 1, 2
), sizes AS (
  SELECT cohort_week, COUNT(*) AS n_cohort FROM signup GROUP BY 1
)
SELECT c.cohort_week, c.week_offset, c.n_active, z.n_cohort,
       CAST(c.n_active AS DOUBLE) / CAST(z.n_cohort AS DOUBLE) AS pct_active
FROM cells c JOIN sizes z USING (cohort_week)
""",
    "events_window_funnel": """
WITH ev AS (
  SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events
), w1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN tns END)
              OVER (PARTITION BY user_id) AS t1
  FROM ev
), w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND tns > t1
                      AND tns <= t1 + 604800000000000 THEN tns END)
              OVER (PARTITION BY user_id) AS t2
  FROM w1
), w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tns > t2
                      AND tns <= t1 + 604800000000000 THEN tns END)
              OVER (PARTITION BY user_id) AS t3
  FROM w2
), per_user AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM w3 GROUP BY 1
)
SELECT CASE WHEN t3 IS NOT NULL THEN 3
            WHEN t2 IS NOT NULL THEN 2
            WHEN t1 IS NOT NULL THEN 1
            ELSE 0 END AS level,
       COUNT(*) AS n_users
FROM per_user
GROUP BY 1
ORDER BY 1
""",
    "events_funnel": """
WITH s1 AS (
  SELECT user_id, event_type, epoch_ns(ts) AS t,
         MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
), s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND t > t_view THEN t END)
              OVER (PARTITION BY user_id) AS t_click
  FROM s1
), s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t > t_click THEN t END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM s2
)
SELECT COUNT(DISTINCT CASE WHEN t_view IS NOT NULL THEN user_id END) AS n_view,
       COUNT(DISTINCT CASE WHEN t_click IS NOT NULL THEN user_id END) AS n_click_after_view,
       COUNT(DISTINCT CASE WHEN t_purchase IS NOT NULL THEN user_id END)
         AS n_purchase_after_click
FROM s3
""",
}


def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + trailing-7-day active users. Rolling COUNT(DISTINCT) has no
    windowed form, so WAU uses the contribution trick: each distinct
    (user, day) row contributes to the 7 report days it keeps the user
    active for (explode a 7-day sequence), then one distinct + count per
    report day. Exact, two shuffles, and — unlike a self-join — the blowup
    is a fixed ×7 regardless of data size. Report days are restricted to
    days with activity (inner join with DAU)."""
    ev = load(spark, sf_dir, "events")
    day = F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day")
    user_days = ev.select(day, "user_id").distinct()
    dau = user_days.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = (
        user_days.select(
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("day"),
            "user_id",
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("wau"))
    )
    return dau.join(contrib, "day").select("day", "dau", "wau").orderBy("day")


QUERIES["events_dau_wau"] = events_dau_wau
ORACLES["events_dau_wau"] = """
WITH user_days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), dau AS (
  SELECT day, COUNT(*) AS dau FROM user_days GROUP BY 1
), contrib AS (
  SELECT DISTINCT CAST(unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS DATE) AS day,
         user_id
  FROM user_days
), wau AS (
  SELECT day, COUNT(*) AS wau FROM contrib GROUP BY 1
)
SELECT day, dau, wau FROM dau JOIN wau USING (day) ORDER BY day
"""


def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is attributed to
    the user's most recent click/view at-or-before the purchase instant
    (the standard last-non-direct-click model), then revenue rolls up per
    touch channel with the mean touch→purchase lag. Purchases with no
    prior touch land in the 'none' bucket. Built on the same
    ``operators.asof`` union-and-window backward join the quote family
    uses — here proving the event-stream→event-stream case on the native
    epoch-nanos axis; the DuckDB oracle is a native ASOF LEFT JOIN, an
    independent implementation of the same semantics.

    Exactness: revenue sums under the decimal-snap discipline; per-row
    lags are exact int64 nanos but the per-channel SUM runs in
    DECIMAL(38,0) — at 100 TB a channel's nanosecond-lag total blows
    past 2^63 (~10^5 purchases × day-scale lags) and an int64 sum would
    wrap (or ANSI-error) while the DuckDB oracle sums in HUGEINT; the
    decimal sum matches the oracle's headroom and makes one correctly
    rounded cast to double at the end. 'none' rows contribute NULL lags
    which both engines' SUM/COUNT skip, and the division is guarded so
    the empty bucket emits NULL rather than tripping ANSI
    divide-by-zero.

    Scale: one shuffle on user_id + per-user sort (the as-of plan);
    channel rollup is a tiny hash aggregate. No range join, no
    per-purchase window scan."""
    from securities_pricing_data_pipeline_spark.operators.asof import (
        asof_join_backward,
    )

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", F.col("event_type").alias("touch_type")
    )
    j = asof_join_backward(
        purchases, touches, key=["user_id"], left_time="ts", right_time="ts",
        value_cols=["touch_type"],
    )
    agg = j.groupBy(
        F.coalesce(F.col("touch_type"), F.lit("none")).alias("touch_type")
    ).agg(
        F.count("*").alias("n_purchases"),
        dsum(F.col("value"), 6).alias("attributed_value"),
        F.sum((F.col("ts") - F.col("asof_time")).cast("decimal(38,0)")).alias(
            "lag_ns_sum"
        ),
        F.count("asof_time").alias("n_matched"),
    )
    return agg.select(
        "touch_type",
        "n_purchases",
        "attributed_value",
        F.when(
            F.col("n_matched") > 0,
            F.col("lag_ns_sum").cast("double")
            / (F.col("n_matched").cast("double") * F.lit(1e9)),
        ).alias("avg_lag_s"),
    )


QUERIES["events_attribution_last_touch"] = events_attribution_last_touch

ORACLES["events_attribution_last_touch"] = """
WITH p AS (
  SELECT event_id, user_id, epoch_ns(ts) AS tns, value
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, epoch_ns(ts) AS tns, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
), j AS (
  SELECT p.event_id, p.value, t.touch_type, p.tns - t.tns AS lag_ns
  FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.tns >= t.tns
)
SELECT COALESCE(touch_type, 'none') AS touch_type,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS attributed_value,
       CASE WHEN COUNT(lag_ns) > 0
            THEN CAST(SUM(lag_ns) AS DOUBLE) / (COUNT(lag_ns) * 1e9)
            ELSE NULL END AS avg_lag_s
FROM j GROUP BY 1
"""


def events_error_spike_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational anomaly gate: hours whose error count exceeds 2× the
    trailing-24-hour mean — the alerting readout an event-pipeline
    operator wires to paging. Formulated ENTIRELY in integers so both
    engines agree bit-for-bit: the spike predicate cross-multiplies
    (err_cnt · window_n > 2 · window_sum) instead of comparing float
    rates, and the emitted trailing mean is one exact-int÷exact-int
    double division. The rolling window runs over the HOURLY pre-
    aggregate (hour-cardinality rows — the global-window rule: reduce
    first, window the reduced frame), ordered by the unique hour epoch."""
    ev = load(spark, sf_dir, "events")
    hours = (
        ev.groupBy((F.expr("ts div 3600000000000") * 3600).alias("hour_epoch"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("err_cnt"),
        )
    )
    w = (
        Window.orderBy("hour_epoch")
        .rowsBetween(-24, -1)
    )
    scored = hours.select(
        "hour_epoch",
        "n_events",
        "err_cnt",
        F.sum("err_cnt").over(w).alias("trail_sum"),
        F.count("err_cnt").over(w).alias("trail_n"),
    ).filter(F.col("trail_n") >= 6)
    return scored.select(
        "hour_epoch",
        "n_events",
        "err_cnt",
        (F.col("trail_sum").cast("double") / F.col("trail_n")).alias("trail_mean"),
        (F.col("err_cnt") * F.col("trail_n") > 2 * F.col("trail_sum")).alias("is_spike"),
    )


QUERIES["events_error_spike_hours"] = events_error_spike_hours

ORACLES["events_error_spike_hours"] = """
WITH hours AS (
  SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_epoch,
         COUNT(*) AS n_events,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err_cnt
  FROM events GROUP BY 1
), scored AS (
  SELECT hour_epoch, n_events, err_cnt,
         SUM(err_cnt) OVER (ORDER BY hour_epoch ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_sum,
         COUNT(err_cnt) OVER (ORDER BY hour_epoch ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_n
  FROM hours
)
SELECT hour_epoch, n_events, CAST(err_cnt AS BIGINT) AS err_cnt,
       CAST(trail_sum AS DOUBLE) / trail_n AS trail_mean,
       err_cnt * trail_n > 2 * trail_sum AS is_spike
FROM scored WHERE trail_n >= 6
"""


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley / CUSUM drift detection over the daily error-count
    series — the changepoint readout behind "did the error RATE shift,
    not just spike" (Page 1954; Hinkley 1971). The textbook recursion
    PH_t = max(0, PH_{t-1} + x_t − x̄) is not window-expressible, but
    its closed form is: PH_t = M_t − min(0, min_{s≤t} M_s) where
    M_t = Σ_{s≤t}(x_s − x̄) — one cumulative sum plus one running min;
    the 0 in the min is the recursion's PH_0 = 0 base case (omit it and
    an opening positive drift is silently absorbed —
    ``tests/test_properties.py`` locks the identity against the
    recursion on random integer series).

    Formulated ENTIRELY in integers so both engines agree bit-for-bit:
    residuals are scaled by the day count (r_d = n·e_d − T, Σr = 0), so
    M, the running min, and PH all stay exact int64; the alarm predicate
    cross-multiplies (5·PH > n·T ⟺ accumulated drift mass exceeds 20 %
    of total error mass) instead of comparing float rates; the only
    float emitted is drift_events = PH/n, one exact-int÷int division.
    Int64 budget: |M| ≤ n·T ≈ 4·10^2 days · 10^14 errors at a 100 TB
    year — three orders under 2^63 (stated like the basket_rules_lift
    note).

    Plan: one day-granularity pre-aggregate (the global-window rule:
    reduce first, window the n_days-row reduced frame), a 1-row scalar
    broadcast, and two unbounded-preceding windows over the unique day
    order."""
    ev = load(spark, sf_dir, "events")
    days = ev.groupBy((F.expr("ts div 86400000000000") * 86400).alias("day_epoch")).agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("err_cnt"),
    )
    scalars = days.agg(
        F.count("*").alias("n_days"), F.sum("err_cnt").alias("total_err")
    )
    w = Window.orderBy("day_epoch").rowsBetween(Window.unboundedPreceding, 0)
    m = F.sum(F.col("n_days") * F.col("err_cnt") - F.col("total_err")).over(w)
    scored = (
        days.crossJoin(F.broadcast(scalars))
        .withColumn("m_units", m)
        .withColumn(
            "run_min", F.least(F.lit(0).cast("long"), F.min("m_units").over(w))
        )
        .withColumn("ph_units", F.col("m_units") - F.col("run_min"))
    )
    return scored.select(
        "day_epoch",
        "n_events",
        "err_cnt",
        "ph_units",
        (F.col("ph_units").cast("double") / F.col("n_days")).alias("drift_events"),
        (5 * F.col("ph_units") > F.col("n_days") * F.col("total_err")).alias(
            "is_alarm"
        ),
    )


QUERIES["events_cusum_changepoint"] = events_cusum_changepoint

ORACLES["events_cusum_changepoint"] = """
WITH days AS (
  SELECT (epoch_ns(ts) // 86400000000000) * 86400 AS day_epoch,
         COUNT(*) AS n_events,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err_cnt
  FROM events GROUP BY 1
), s AS (
  SELECT COUNT(*) AS n_days, SUM(err_cnt) AS total_err FROM days
), m AS (
  SELECT day_epoch, n_events, err_cnt, n_days, total_err,
         SUM(n_days * err_cnt - total_err) OVER
           (ORDER BY day_epoch ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS m_units
  FROM days, s
), ph AS (
  SELECT *, m_units - LEAST(0, MIN(m_units) OVER
           (ORDER BY day_epoch ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS ph_units
  FROM m
)
SELECT day_epoch, n_events, CAST(err_cnt AS BIGINT) AS err_cnt,
       CAST(ph_units AS BIGINT) AS ph_units,
       CAST(ph_units AS DOUBLE) / n_days AS drift_events,
       5 * ph_units > n_days * total_err AS is_alarm
FROM ph
"""


def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session paths — the product-analytics "what do users actually
    do" readout: gap-sessionize (the events_sessionize lag-cumsum), take
    each session's first four event types in (ts, event_id) order as a
    '>'-joined path, and rank paths by session count. Path construction
    is IN-ROW array work on the session aggregate (sort_array of
    (ts, event_id, type) structs → slice 4 → join) — no per-step
    self-joins, and event_id breaks timestamp ties so the order is total
    in both engines. n_sessions and lengths are exact ints; avg session
    length is one int÷int double division. Plan: the two session windows
    shuffle on user_id once; the path rollup is a string-keyed hash
    aggregate; top-15 is a TakeOrdered."""
    ev = load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, 0)
    flagged = ev.withColumn(
        "new_session",
        F.when(F.col("ts") - F.lag("ts").over(w_order) > F.lit(_GAP_NS), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w_cum))
    per = flagged.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                4,
            ),
            ">",
        ).alias("path"),
        F.count("*").alias("session_len"),
    )
    return (
        per.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            (F.sum("session_len").cast("double") / F.count("*")).alias(
                "avg_session_len"
            ),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(15)
    )


QUERIES["events_path_topk"] = events_path_topk

ORACLES["events_path_topk"] = """
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
         CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, event_id, event_type, tns,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per AS (
  SELECT user_id, session_id,
         array_to_string((list(event_type ORDER BY tns, event_id))[1:4], '>')
           AS path,
         COUNT(*) AS session_len
  FROM sessions GROUP BY 1, 2
)
SELECT path, COUNT(*) AS n_sessions,
       CAST(SUM(session_len) AS DOUBLE) / COUNT(*) AS avg_session_len
FROM per GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 15
"""


def events_ab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment evaluation: users split into two arms by the stable
    md5 hash (the sampling family's split discipline — assignment is
    reproducible across engines and re-runs), conversion = the user is a
    heavy purchaser (>= 14 purchase events; per-user event rates are
    scale-constant in this corpus, so the definition is stable across
    SFs), scored with the 2×2 chi-square statistic
    χ² = N(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) and the 0.05 significance
    gate (χ²₁ > 3.841) — the readout an experimentation pipeline emits.

    Exactness: all four cells are exact integer counts from one
    user-level aggregate; the statistic converts each exact count to
    double once and applies an explicitly parenthesized op order, so
    both engines run the identical IEEE sequence (counts can exceed
    DECIMAL(38,0) budgets when squared at 100 TB, so the double path —
    not a decimal widening — is the portable choice here).

    Plan: one scan → user-level (max purchase flag) hash aggregate →
    one 4-way conditional-sum reduce to a single row. No windows, no
    joins; the user aggregate's map-side partials absorb hot users."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import hash_bucket

    ev = load(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) >= 14
        ).cast("int").alias("converted")
    )
    arm_b = (hash_bucket(F.col("user_id")) % 2 == 1).cast("int")
    cells = users.select("converted", arm_b.alias("arm_b")).agg(
        F.sum(F.expr("CASE WHEN arm_b = 0 AND converted = 1 THEN 1 ELSE 0 END")).alias("a"),
        F.sum(F.expr("CASE WHEN arm_b = 0 AND converted = 0 THEN 1 ELSE 0 END")).alias("b"),
        F.sum(F.expr("CASE WHEN arm_b = 1 AND converted = 1 THEN 1 ELSE 0 END")).alias("c"),
        F.sum(F.expr("CASE WHEN arm_b = 1 AND converted = 0 THEN 1 ELSE 0 END")).alias("d"),
    )
    a, b, c, d = (F.col(x).cast("double") for x in "abcd")
    n = a + b + c + d
    diff = (a * d) - (b * c)
    den = ((a + b) * (c + d)) * ((a + c) * (b + d))
    # degenerate table (an empty margin) → χ² defined as 0, not an error
    chi2 = F.when(den == 0, F.lit(0.0)).otherwise((n * (diff * diff)) / den)
    return cells.select(
        F.col("a").cast("long").alias("conv_a"),
        F.col("b").cast("long").alias("nonconv_a"),
        F.col("c").cast("long").alias("conv_b"),
        F.col("d").cast("long").alias("nonconv_b"),
        chi2.alias("chi2"),
        (chi2 > F.lit(3.841)).alias("significant"),
    )


QUERIES["events_ab_chi2"] = events_ab_chi2

ORACLES["events_ab_chi2"] = """
WITH users AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY 1
), tagged AS (
  SELECT converted,
         CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 % 2 = 1
              THEN 1 ELSE 0 END AS arm_b
  FROM users
), cells AS (
  SELECT SUM(CASE WHEN arm_b = 0 AND converted = 1 THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN arm_b = 0 AND converted = 0 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN arm_b = 1 AND converted = 1 THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN arm_b = 1 AND converted = 0 THEN 1 ELSE 0 END) AS d
  FROM tagged
)
SELECT CAST(a AS BIGINT) AS conv_a, CAST(b AS BIGINT) AS nonconv_a,
       CAST(c AS BIGINT) AS conv_b, CAST(d AS BIGINT) AS nonconv_b,
       CASE WHEN ((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d))
                 * ((CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d)) = 0 THEN 0.0
            ELSE ((CAST(a AS DOUBLE) + b + c + d)
                  * ((CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                     * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)))
                 / (((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d))
                    * ((CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d))) END AS chi2,
       CASE WHEN ((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d))
                 * ((CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d)) = 0 THEN 0.0
            ELSE ((CAST(a AS DOUBLE) + b + c + d)
                  * ((CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                     * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)))
                 / (((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d))
                    * ((CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d))) END > 3.841 AS significant
FROM cells
"""
