"""Spark SQL string entry point: the same engine surface exposed as ANSI
SQL over registered views (``spark.sql``), exercising subquery forms the
DataFrame-API modules don't — EXISTS (correlated), IN (uncorrelated with
HAVING), and scalar subqueries. Catalyst rewrites all three to joins
(RewritePredicateSubquery → left-semi; scalar → broadcast single-row), so
the physical plans are the same shuffle/broadcast shapes as the DataFrame
queries — no nested-loop per-row execution anywhere.

Because both engines run literally the same ANSI text, these also pin the
engine's SQL-dialect compatibility for the constructs they use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from securities_pricing_data_pipeline_spark.queries.helpers import load

_TABLES = ("customer", "orders", "lineitem")


def _register(spark: SparkSession, sf_dir: str) -> None:
    # re-registering per call is cheap (a catalog map write, no scan) and
    # keeps the views pinned to the requested scale directory
    for t in _TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


SQL_EXISTS_LATE_SHIP = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

SQL_IN_HAVING_LARGE_ORDERS = """
SELECT c_name, c_custkey AS cust_key, o_orderkey AS order_key,
       CAST(o_orderdate AS DATE) AS order_date, o_totalprice AS total_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY total_price DESC, order_key
LIMIT 100
"""

SQL_SCALAR_SUBQUERY_ABOVE_AVG = """
SELECT c_mktsegment AS segment, COUNT(*) AS n_rich_customers
FROM customer
WHERE c_acctbal > (SELECT AVG(CAST(c_acctbal AS DECIMAL(38,4))) FROM customer)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def sql_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → Catalyst left-semi join (Q4-shaped): orders in a
    quarter having at least one line shipped after the order date."""
    _register(spark, sf_dir)
    return spark.sql(SQL_EXISTS_LATE_SHIP)


def sql_in_having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over a HAVING subquery → semi join on the pre-aggregated key set
    (Q18-shaped): customers whose orders exceed 250 total units."""
    _register(spark, sf_dir)
    return spark.sql(SQL_IN_HAVING_LARGE_ORDERS)


def sql_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → single-row broadcast: customers above
    the global average balance, counted per segment."""
    _register(spark, sf_dir)
    return spark.sql(SQL_SCALAR_SUBQUERY_ABOVE_AVG)


SQL_PIVOT_ORDER_STATUS = """
SELECT segment,
       coalesce(st_o, 0) AS n_open,
       coalesce(st_f, 0) AS n_fulfilled,
       coalesce(st_p, 0) AS n_pending
FROM (
  SELECT c.c_mktsegment AS segment, o.o_orderstatus AS status
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) PIVOT (COUNT(*) FOR status IN ('O' AS st_o, 'F' AS st_f, 'P' AS st_p))
"""


def sql_pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause — the dialect surface the DataFrame twin
    (``pivot_segment_status``) doesn't touch. One caveat pins the
    portable subset: Spark's parser rejects double-quoted pivot aliases
    (it reserves double quotes for string literals by default), so
    cross-engine PIVOT text must use bare aliases ('O' AS st_o).
    Catalyst compiles this to the same Expand-free single hash
    aggregate with conditional counters as the explicit-value-list
    DataFrame pivot. Identical text runs on DuckDB."""
    _register(spark, sf_dir)
    return spark.sql(SQL_PIVOT_ORDER_STATUS)


SQL_WINDOW_RUNNING_SHARE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS rev_dec
  FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
    AND CAST(o_orderdate AS DATE) <  DATE '1997-04-01'
  GROUP BY 1
)
SELECT order_date,
       CAST(rev_dec AS DOUBLE) AS day_revenue,
       CAST(SUM(rev_dec) OVER (ORDER BY order_date
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_revenue,
       CAST(SUM(rev_dec) OVER (ORDER BY order_date
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE)
         / CAST(SUM(rev_dec) OVER () AS DOUBLE) * 100.0 AS running_pct
FROM daily
ORDER BY order_date
"""


def sql_window_running_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI window-function text (running total + percent-of-final over a
    quarter's daily revenue) run verbatim on both engines — pins window
    frame and ordering dialect compatibility. The windows sit on the
    ~90-row pre-aggregated frame, so the unpartitioned ordering is free."""
    _register(spark, sf_dir)
    return spark.sql(SQL_WINDOW_RUNNING_SHARE)


SQL_RECURSIVE_REACHABILITY = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
), reach(sk, depth) AS (
  SELECT CAST(1 AS BIGINT) AS sk, 0 AS depth
  UNION ALL
  SELECT e.dst, r.depth + 1
  FROM reach r JOIN edges e ON e.src = r.sk
  WHERE r.depth < 2
)
SELECT sk AS supp_key, CAST(MIN(depth) AS INT) AS min_depth,
       CAST(COUNT(*) AS BIGINT) AS n_paths
FROM reach
GROUP BY sk
ORDER BY min_depth, supp_key
"""


def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 recursive CTE (WITH RECURSIVE ... UNION ALL): two-hop BFS
    over the co-supply graph from supplier 1, min reach depth + path
    multiplicity per supplier. Spark supports only UNION ALL recursion
    (no distinct-union fixpoints yet), so the frontier is depth-bounded
    and deduped in the outer aggregate — the shape to use until
    UNION-distinct lands. Identical text runs on DuckDB. The iterative
    DataFrame twin with per-iteration dedup is operators/graph.pagerank /
    llmdata.dedup.connected_components."""
    _register(spark, sf_dir)
    return spark.sql(SQL_RECURSIVE_REACHABILITY)


SQL_LATERAL_TOPK_ORDERS = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey <= 200
ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
"""


def sql_lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with per-row ORDER BY + LIMIT —
    each customer's top-2 orders by price. Spark 4 decorrelates the
    lateral into rank-filtered windows with map-side ``WindowGroupLimit``
    pushdown (partial top-k before the exchange) plus a broadcast join —
    not a per-row nested loop — so the shape scales like the windowed
    top-k-per-group DataFrame twin (``topk_parts_per_brand``); identical
    ANSI text runs on DuckDB. Pins the LATERAL dialect surface the other
    subquery forms don't touch."""
    _register(spark, sf_dir)
    return spark.sql(SQL_LATERAL_TOPK_ORDERS)


QUERIES = {
    "sql_exists_late_ship": sql_exists_late_ship,
    "sql_lateral_topk_orders": sql_lateral_topk_orders,
    "sql_recursive_reachability": sql_recursive_reachability,
    "sql_window_running_share": sql_window_running_share,
    "sql_pivot_order_status": sql_pivot_order_status,
    "sql_in_having_large_orders": sql_in_having_large_orders,
    "sql_scalar_subquery_above_avg": sql_scalar_subquery_above_avg,
}

# the oracle IS the same SQL text — DuckDB runs it over identical views
ORACLES = {
    "sql_exists_late_ship": SQL_EXISTS_LATE_SHIP,
    "sql_lateral_topk_orders": SQL_LATERAL_TOPK_ORDERS,
    "sql_window_running_share": SQL_WINDOW_RUNNING_SHARE,
    "sql_pivot_order_status": SQL_PIVOT_ORDER_STATUS,
    "sql_recursive_reachability": SQL_RECURSIVE_REACHABILITY,
    "sql_in_having_large_orders": SQL_IN_HAVING_LARGE_ORDERS,
    "sql_scalar_subquery_above_avg": SQL_SCALAR_SUBQUERY_ABOVE_AVG,
}
