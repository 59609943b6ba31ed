"""Classic warehouse analytics (TPC-H-shaped) over the driver's star schema.

The reference delegates all relational compute to Snowflake; its serving
layer answers star-join + aggregate dashboards (SURVEY §2.6, J2 star join
`7. merge_fact_daily_price.sql:33-36`). These queries demonstrate the same
capability class at depth — multi-way joins with broadcast dims, filtered
aggregation, top-N with deterministic tie-breaks — expressed so Catalyst
keeps the whole plan in WholeStageCodegen:

* constant-size dims (`region`, `nation`) carry explicit ``broadcast``
  hints; SF-scaled tables (`customer`, `supplier`, `orders`) deliberately
  do NOT — at 100 TB they are fact-sized, so the plan uses shuffle joins
  on their keys and lets AQE demote to broadcast at runtime when a
  filtered side turns out small;
* every float SUM goes through the decimal-grid rule in
  ``queries.helpers`` so Spark's partial aggregation and DuckDB's serial
  scan agree bit-for-bit;
* top-N orderings always end in a unique key so ties never flip rows
  between engines, and ``limit`` after ``orderBy`` compiles to
  TakeOrderedAndProject (per-partition top-N, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.queries.helpers import (
    davg,
    dec,
    dsum,
    load,
    sql_davg,
    sql_dsum,
)

def _revenue():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1.0 - F.col("l_discount"))


_REVENUE_SQL = "l_extendedprice * (1.0 - l_discount)"


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-shaped pricing summary: one hash aggregate over the fact table,
    grouped on two low-cardinality flags. Map-side partial aggregation
    collapses ~all rows before the (tiny) shuffle."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date")
    )
    charge = _revenue() * (1.0 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 4).alias("sum_base_price"),
            dsum(_revenue(), 4).alias("sum_disc_price"),
            # charge has exactly 6 decimal digits (price:2 × disc:2 × tax:2);
            # scale 6 keeps the grid tie-free (scale 4 would hit .5 ties)
            dsum(charge, 6).alias("sum_charge"),
            davg(F.col("l_quantity"), 2).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 4).alias("avg_price"),
            davg(F.col("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped shipping priority: segment-filtered customer semi-joined
    into orders, joined to lineitem, top-10 open orders by revenue. Both
    fact-side joins shuffle on their natural keys (custkey, orderkey); the
    date/segment filters push down to all three parquet scans and AQE may
    demote either join to broadcast when the filtered side is small."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    )
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("order_date"), "o_orderpriority")
        .agg(dsum(_revenue(), 4).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("order_key"),
            "revenue",
            "order_date",
            F.col("o_orderpriority").alias("order_priority"),
        )
        .orderBy(F.desc("revenue"), "order_date", "order_key")
        .limit(10)
    )


def tpch_q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped regional revenue: six-way join. region/nation are
    broadcast (constant size); customer and supplier enrichments shuffle on
    their keys since both scale with the fact tables. The final aggregate
    has ~25 groups, so map-side partials collapse it before the shuffle."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")

    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner"
    ).select("n_nationkey", "n_name")
    asia_cust = cust.join(
        F.broadcast(asia_nations), cust.c_nationkey == F.col("n_nationkey"), "inner"
    ).select("c_custkey", "c_nationkey", "n_name")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .join(supp, li.l_suppkey == supp.s_suppkey, "inner")
        # local-supplier condition: supplier sits in the customer's nation
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(_revenue(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped forecast revenue: pure scan-filter-aggregate; all three
    predicates push down to the parquet reader, no shuffle at all (single
    scalar aggregate)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped returned-item report: top-20 customers by lost revenue in
    a quarter. nation is broadcast; orders (date-filtered) and customer
    join via shuffle on their keys — at 100 TB the quarter filter still
    leaves a fact-sized orders slice. The aggregate shuffles on custkey
    (high cardinality → scales linearly), then TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(cust, F.col("o_custkey") == cust.c_custkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .groupBy(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("c_acctbal").alias("acct_bal"),
            F.col("n_name").alias("nation"),
        )
        .agg(dsum(_revenue(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "cust_key")
        .limit(20)
    )


def tpch_q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped bilateral trade volume: revenue shipped between two nations
    by year, in both directions. Both nation joins broadcast (constant-size
    dim with a 2-row filter applied on each side); the supplier/customer
    enrichments shuffle on their keys; one aggregate over (supp_nation,
    cust_nation, year) finishes it — 4 groups, collapsed map-side."""
    n1 = load(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("snk"),
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(n1.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cnk"),
    )
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") <= F.lit("1997-12-31").cast("date"))
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg(dsum(_revenue(), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped promo revenue share: the percentage of one month's
    revenue coming from PROMO parts — a ratio of two conditional sums over
    a lineitem⋈part join, computed in a single aggregate pass. The date
    filter pushes to the fact scan; the division runs once on exact
    decimal sums cast to double."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo_rev = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            dsum(promo_rev, 4).alias("promo_revenue"),
            dsum(_revenue(), 4).alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            (F.col("promo_revenue") / F.col("total_revenue") * 100.0).alias("promo_pct"),
        )
    )


QUERIES = {
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q7_nation_trade": tpch_q7_nation_trade,
    "tpch_q14_promo_share": tpch_q14_promo_share,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q5_regional_revenue": tpch_q5_regional_revenue,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q10_returned_items": tpch_q10_returned_items,
}

ORACLES = {
    "tpch_q14_promo_share": f"""
SELECT {sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} ELSE 0.0 END", 4)}
         AS promo_revenue,
       {sql_dsum(_REVENUE_SQL, 4)} AS total_revenue,
       ({sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} ELSE 0.0 END", 4)}
        / {sql_dsum(_REVENUE_SQL, 4)} * 100.0) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
""",
    "tpch_q7_nation_trade": f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(CAST(l_shipdate AS DATE)) AS l_year,
       {sql_dsum(_REVENUE_SQL, 4)} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_3', 'NATION_7')
  AND n2.n_name IN ('NATION_3', 'NATION_7')
  AND n1.n_name <> n2.n_name
  AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
    "tpch_q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 2)} AS sum_qty,
       {sql_dsum('l_extendedprice', 4)} AS sum_base_price,
       {sql_dsum(_REVENUE_SQL, 4)} AS sum_disc_price,
       {sql_dsum(_REVENUE_SQL + ' * (1.0 + l_tax)', 6)} AS sum_charge,
       {sql_davg('l_quantity', 2)} AS avg_qty,
       {sql_davg('l_extendedprice', 4)} AS avg_price,
       {sql_davg('l_discount', 6)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    "tpch_q3_shipping_priority": f"""
SELECT l_orderkey AS order_key,
       {sql_dsum(_REVENUE_SQL, 4)} AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority AS order_priority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, order_date, order_key
LIMIT 10
""",
    "tpch_q5_regional_revenue": f"""
SELECT n_name AS nation, {sql_dsum(_REVENUE_SQL, 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, nation
""",
    "tpch_q6_forecast_revenue": f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24.0
""",
    "tpch_q10_returned_items": f"""
SELECT c_custkey AS cust_key, c_name AS cust_name, c_acctbal AS acct_bal,
       n_name AS nation, {sql_dsum(_REVENUE_SQL, 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, cust_key
LIMIT 20
""",
}
