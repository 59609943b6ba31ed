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


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped cheapest-supplier lookup (partsupp reshaped onto lineitem:
    the testdata has no partsupp table, so observed line cost per
    part×supplier stands in for ps_supplycost). Per-part argmin is a
    row_number window over the part key — the window shuffle reuses the
    aggregate's (partkey) partitioning so Catalyst plans ONE exchange for
    both. Costs stay exact decimals through the argmin so the tie-break
    (cost, suppkey) can never flip between engines."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    cost = (
        li.join(part.select("p_partkey", "p_brand"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "p_brand", "l_suppkey")
        .agg(F.sum(dec(F.col("l_extendedprice"), 2)).alias("cost_dec"))
    )
    w = Window.partitionBy("l_partkey").orderBy("cost_dec", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(supp, best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            F.col("l_partkey").alias("part_key"),
            "p_brand",
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
            F.col("cost_dec").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("supply_cost"), "part_key")
        .limit(20)
    )


def tpch_q4_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped order-priority check (no l_commitdate/l_receiptdate in the
    testdata, so "late" = shipped >30 days after order date). The EXISTS
    decorrelates to a left-semi join with a non-equi residual; only
    (orderkey, two dates) travel through the shuffle."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-07-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate.cast("date") > F.date_add(orders.o_orderdate.cast("date"), 30)),
        "left_semi",
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count("*").alias("order_count"))
        .orderBy("order_priority")
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped national market share: NATION_3 suppliers' slice of ASIA's
    ECONOMY-part revenue by year. region/nation broadcast; customer /
    supplier / orders shuffle on their keys; the share is one conditional
    aggregate — numerator and denominator come out of the same pass, and
    the only double division happens on exact decimal sums."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cnk"))
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cnk"), "left_semi"
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("snk"),
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") <= F.lit("1997-12-31").cast("date"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", _revenue()).otherwise(F.lit(0.0))
    return (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp.select("s_suppkey", "supp_nation"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year(F.col("o_orderdate").cast("date")).alias("o_year"))
        .agg(
            dsum(nat_rev, 4).alias("nation_revenue"),
            dsum(_revenue(), 4).alias("total_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped product-type profit by nation and year (no ps_supplycost
    in the testdata; cost proxy = 10% of retail price × quantity). One
    five-way join, profit snapped at scale 6 (price 2 × disc 2 digits →
    4; 0.1·retail·qty → 5), single aggregate over ~25×year groups."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = _revenue() - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part.select("p_partkey", "p_retailprice"), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(dsum(amount, 6).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped customer order-count histogram: left join so zero-order
    customers survive, count per customer, then a second (tiny) aggregate
    over the counts. All-integer arithmetic — no float parity concerns.
    The custkey aggregate reuses the join's shuffle partitioning."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped top supplier: quarterly revenue per supplier, keep those
    equal to the max. The max is a 1-row aggregate broadcast back over the
    per-supplier revenues; equality compares EXACT decimals (cast to
    double only in the output), so ties are engine-stable."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    supp = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(dec(_revenue(), 4)).alias("rev_dec"))
    mx = rev.agg(F.max("rev_dec").alias("max_dec"))
    return (
        rev.join(F.broadcast(mx), rev.rev_dec == F.col("max_dec"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("supp_key")
    )


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped small-lot revenue: lines of one brand whose quantity is
    under 20% of that part's average. The correlated AVG decorrelates to a
    per-part aggregate joined back on partkey; the threshold comparison is
    all-bigint (qty < 0.2·sum/cnt ⇔ 100·5·qty·cnt < 100·sum) so no
    rounding can flip a row. Output divides one exact sum by 7.0."""
    li = load(spark, sf_dir, "lineitem")
    brand_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    qty_units = (F.col("l_quantity") * 100).cast("long")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.sum(qty_units).alias("sq_units"), F.count("*").alias("cq")
    )
    lines = li.join(brand_parts, li.l_partkey == F.col("p_partkey"), "left_semi")
    return (
        lines.join(per_part, lines.l_partkey == F.col("agg_pk"))
        .filter(qty_units * 5 * F.col("cq") < F.col("sq_units"))
        .agg(
            (dsum(F.col("l_extendedprice"), 2) / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped large-volume orders: orders whose total quantity exceeds
    300. The HAVING pre-aggregates lineitem on orderkey BEFORE any join —
    at 100 TB the filter passes ~1e-3 of orders, so the join probes a tiny
    build side (AQE demotes to broadcast)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_ok"))
        .agg(F.sum(dec(F.col("l_quantity"), 2)).alias("sq"))
        .filter(F.col("sq") > 300)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == F.col("big_ok"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_name").alias("cust_name"),
            F.col("c_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            F.col("sq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), "order_key")
        .limit(100)
    )


def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped disjunctive predicate revenue: three brand/size/quantity
    clauses OR-ed over a lineitem⋈part join. Catalyst extracts the common
    p_partkey equi-condition so the join stays hash-based with the residual
    OR as a post-join filter; the partkey filter union pushes to the part
    scan."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#5") & (F.col("p_size").between(1, 15)) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#14") & (F.col("p_size").between(1, 25)) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 35)) & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(_revenue(), 4).alias("revenue"), F.count("*").alias("n_lines"))
    )


def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped sales-opportunity scan: above-average-balance customers
    with no orders, summarized per nation. The global average is a 1-row
    broadcast; the no-orders test is a left-anti join shuffling only
    custkeys. acctbal carries 2 decimal digits → scale-2 snap."""
    cust = load(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal"), 2).alias("avg_bal")
    )
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count("*").alias("n_custs"),
            dsum(F.col("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("nation_key")
    )


def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped important-stock scan (no partsupp in the testdata, so
    per-part "stock value" is the observed revenue shipped by suppliers of
    one nation). The HAVING threshold is a scalar subquery over the SAME
    filtered set — expressed as an unpartitioned window SUM over the
    per-part aggregate so the fact table is scanned and aggregated ONCE
    (a 1-row-aggregate + broadcast formulation plans the whole lineitem
    subtree twice; the window pass touches only #parts narrow rows, a few
    MB even at 100 TB). The comparison (value·1000 > total) stays in
    exact decimals end-to-end — no double rounding can flip a part
    across the threshold."""
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    li = load(spark, sf_dir, "lineitem").join(
        supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(dec(_revenue(), 4)).alias("value_dec")
    )
    total = F.sum("value_dec").over(Window.partitionBy())
    return (
        per_part.withColumn("total_dec", total)
        .filter(F.col("value_dec") * 1000 > F.col("total_dec"))
        .select("part_key", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "part_key")
    )


def tpch_q12_late_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped shipping-quality check (no l_shipmode/receiptdate in the
    testdata: line status stands in for ship mode, "late" = shipped >30
    days after order date). The orders⋈lineitem join shuffles on orderkey;
    both conditional counts come out of ONE pass (map-side partials over 2
    groups), the canonical CASE-WHEN pivot the reference delegates to
    Snowflake dashboards."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 30)
        )
        .groupBy(F.col("l_linestatus").alias("line_status"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("line_status")
    )


def tpch_q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped supplier diversity count (lineitem is the part↔supplier
    link in lieu of partsupp; negative account balance stands in for the
    complaints exclusion). The exclusion is a broadcast anti-join (the
    excluded set is tiny by construction); COUNT(DISTINCT) shuffles only
    the already-distinct (brand,type,size,suppkey) quads after a partial
    distinct — exact and engine-stable, no approximation."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0)
    links = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        links.groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            F.col("p_size").alias("part_size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "part_type", "part_size")
    )


def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped part-promotion shortlist (no partsupp availability, so
    the "excess stock" test is shipped-quantity > a fixed lot size). A
    chain of semi-joins — name-filtered parts gate lineitem, the per
    (supplier,part) quantity aggregate gates suppliers, the nation gates
    the output — so only keys ever shuffle and no payload column travels
    beyond its own stage. Quantity sums compare as exact decimals."""
    parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    shipped = (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec(F.col("l_quantity"), 2)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 50)
        .select("l_suppkey")
        .distinct()
    )
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_suppkey").alias("supp_key"), F.col("s_name").alias("supp_name"))
        .orderBy("supp_name")
    )


def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped blame assignment: suppliers of one nation whose line was
    the ONLY late one (ship >60 days after order) on a multi-supplier
    finished order. The EXISTS / NOT EXISTS pair decorrelates to a
    left-semi and a left-anti self-join on the (orderkey, suppkey, late)
    projection — all three legs shuffle on orderkey and carry two longs
    and a boolean, never lineitem payload. The distinct co-supplier frames
    keep the semi/anti build sides minimal at 100 TB."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    ords = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 60)
        ).alias("late"),
    )
    co = ords.select(
        F.col("l_orderkey").alias("co_ok"), F.col("l_suppkey").alias("co_sk")
    ).distinct()
    co_late = (
        ords.filter("late")
        .select(F.col("l_orderkey").alias("cl_ok"), F.col("l_suppkey").alias("cl_sk"))
        .distinct()
    )
    l1 = ords.filter("late")
    l1 = l1.join(
        co,
        (l1.l_orderkey == co.co_ok) & (l1.l_suppkey != co.co_sk),
        "left_semi",
    )
    l1 = l1.join(
        co_late,
        (l1.l_orderkey == co_late.cl_ok) & (l1.l_suppkey != co_late.cl_sk),
        "left_anti",
    )
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    return (
        l1.join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "supp_name")
        .limit(20)
    )


QUERIES = {
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q4_priority_late": tpch_q4_priority_late,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q13_order_count_distribution": tpch_q13_order_count_distribution,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q17_small_quantity_revenue": tpch_q17_small_quantity_revenue,
    "tpch_q18_large_volume_customers": tpch_q18_large_volume_customers,
    "tpch_q19_disjunctive_revenue": tpch_q19_disjunctive_revenue,
    "tpch_q22_idle_customers": tpch_q22_idle_customers,
    "tpch_q7_nation_trade": tpch_q7_nation_trade,
    "tpch_q14_promo_share": tpch_q14_promo_share,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q5_regional_revenue": tpch_q5_regional_revenue,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q11_important_parts": tpch_q11_important_parts,
    "tpch_q12_late_priority_classes": tpch_q12_late_priority_classes,
    "tpch_q16_supplier_count_by_part": tpch_q16_supplier_count_by_part,
    "tpch_q20_promotion_suppliers": tpch_q20_promotion_suppliers,
    "tpch_q21_waiting_suppliers": tpch_q21_waiting_suppliers,
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

ORACLES.update(
    {
        "tpch_q11_important_parts": f"""
WITH per_part AS (
  SELECT l_partkey AS part_key,
         SUM(CAST({_REVENUE_SQL} AS DECIMAL(38,4))) AS value_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3')
  GROUP BY 1
)
SELECT part_key, CAST(value_dec AS DOUBLE) AS part_value
FROM (SELECT part_key, value_dec, SUM(value_dec) OVER () AS total_dec FROM per_part)
WHERE value_dec * 1000 > total_dec
ORDER BY part_value DESC, part_key
""",
        "tpch_q12_late_priority_classes": """
SELECT l_linestatus AS line_status,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
  AND CAST(l_shipdate AS DATE) >  CAST(o_orderdate AS DATE) + 30
GROUP BY 1 ORDER BY 1
""",
        "tpch_q16_supplier_count_by_part": """
SELECT p_brand AS brand, p_type AS part_type, p_size AS part_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, brand, part_type, part_size
""",
        "tpch_q20_promotion_suppliers": """
SELECT s_suppkey AS supp_key, s_name AS supp_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 50)
ORDER BY supp_name
""",
        "tpch_q21_waiting_suppliers": """
WITH ords AS (
  SELECT l_orderkey, l_suppkey,
         CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60 AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name AS supp_name, COUNT(*) AS numwait
FROM ords l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE l1.late
  AND n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM ords l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM ords l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY 1
ORDER BY numwait DESC, supp_name
LIMIT 20
""",
        "tpch_q2_min_cost_supplier": """
WITH cost AS (
  SELECT l_partkey, p_brand, l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS cost_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD' AND p_size <= 10
  GROUP BY 1, 2, 3
), best AS (
  SELECT *, row_number() OVER (PARTITION BY l_partkey
                               ORDER BY cost_dec, l_suppkey) AS rn
  FROM cost
)
SELECT l_partkey AS part_key, p_brand, s_name AS supp_name,
       n_name AS nation, CAST(cost_dec AS DOUBLE) AS supply_cost
FROM best
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE rn = 1
ORDER BY supply_cost DESC, part_key
LIMIT 20
""",
        "tpch_q4_priority_late": """
SELECT o_orderpriority AS order_priority, COUNT(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
  )
GROUP BY 1 ORDER BY 1
""",
        "tpch_q8_market_share": f"""
WITH flat AS (
  SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
         n2.n_name AS supp_nation,
         {_REVENUE_SQL} AS rev
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
)
SELECT o_year,
       {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0.0 END", 4)}
         AS nation_revenue,
       {sql_dsum('rev', 4)} AS total_revenue,
       ({sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0.0 END", 4)}
        / {sql_dsum('rev', 4)}) AS mkt_share
FROM flat GROUP BY o_year ORDER BY o_year
""",
        "tpch_q9_product_profit": f"""
SELECT n_name AS nation, year(CAST(o_orderdate AS DATE)) AS o_year,
       {sql_dsum(_REVENUE_SQL + ' - 0.1 * p_retailprice * l_quantity', 6)}
         AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
""",
        "tpch_q13_order_count_distribution": """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
        "tpch_q15_top_supplier": f"""
WITH rev AS (
  SELECT l_suppkey, SUM(CAST({_REVENUE_SQL} AS DECIMAL(38,4))) AS rev_dec
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS supp_key, s_name AS supp_name,
       CAST(rev_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
ORDER BY supp_key
""",
        "tpch_q17_small_quantity_revenue": f"""
WITH per_part AS (
  SELECT l_partkey AS agg_pk,
         SUM(CAST(l_quantity * 100 AS BIGINT)) AS sq_units,
         COUNT(*) AS cq
  FROM lineitem GROUP BY 1
)
SELECT {sql_dsum('l_extendedprice', 2)} / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN per_part ON l_partkey = agg_pk
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
  AND CAST(l_quantity * 100 AS BIGINT) * 5 * cq < sq_units
""",
        "tpch_q18_large_volume_customers": """
WITH big AS (
  SELECT l_orderkey AS big_ok, SUM(CAST(l_quantity AS DECIMAL(38,2))) AS sq
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 300
)
SELECT c_name AS cust_name, c_custkey AS cust_key, o_orderkey AS order_key,
       CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice AS total_price, CAST(sq AS DOUBLE) AS sum_qty
FROM orders
JOIN big ON o_orderkey = big_ok
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, order_key
LIMIT 100
""",
        "tpch_q19_disjunctive_revenue": f"""
SELECT {sql_dsum(_REVENUE_SQL, 4)} AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
        "tpch_q22_idle_customers": f"""
WITH avg_bal AS (
  SELECT {sql_davg('c_acctbal', 2)} AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS nation_key, COUNT(*) AS n_custs,
       {sql_dsum('c_acctbal', 2)} AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1 ORDER BY 1
""",
    }
)
