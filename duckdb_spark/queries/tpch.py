"""TPC-H-style relational queries adapted to the driver's star schema.

These mirror the reference's TPC-H workload (`extension/tpch/dbgen/queries/
q01.sql`–`q22.sql`), adapted to the driver's slimmed columns (no partsupp,
no l_commitdate/l_receiptdate/l_shipmode, o_orderdate/l_shipdate are
timestamps). Every query is declared via the DataFrame API so Catalyst
handles pushdown/join-order/broadcast; the oracle SQL is the same query in
DuckDB dialect for the driver's differential gate.

Scale notes (100 TB posture):
- region/nation/part/supplier/customer are dimension tables → Spark
  broadcast-joins them automatically under the configured threshold; fact-
  fact joins (lineitem⋈orders) shuffle on the join key, which AQE sizes.
- Aggregates are partial+final (map-side combine) automatically.
- All outputs round doubles (2dp) so driver value-hash comparison is stable
  across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_spark.catalog import load_table
from duckdb_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


from duckdb_spark.functions.aggregates import money_sum  # noqa: E402 — shared exact-money Σ


# --------------------------------------------------------------------- q01
@register(
    "tpch_q01",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
       ROUND(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def tpch_q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (reference q01.sql): scan+filter+8-agg groupBy.

    Plan check: filter pushes to parquet scan; partial aggregation before the
    32-partition shuffle on (returnflag, linestatus) — 6 groups, trivially
    skew-free at any SF.
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            money_sum(disc_price, 4).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------- q03
@register(
    "tpch_q03",
    oracle="""
SELECT o_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE)                         AS orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def tpch_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (reference q03.sql). customer is a dim → broadcast;
    orders⋈lineitem shuffles on orderkey."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < "1998-01-01")
        .join(lineitem.filter(F.col("l_shipdate") > "1998-01-01"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("o_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------- q04
@register(
    "tpch_q04",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def tpch_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking (reference q04.sql; EXISTS adapted to
    l_shipdate > o_orderdate+30d since the fixture has no commit/receipt
    dates). Semi join ≡ DuckDB's MARK join collapse."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    return (
        o.join(lineitem, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------- q05
@register(
    "tpch_q05",
    oracle="""
SELECT n_name, CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
""",
)
def tpch_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (reference q05.sql): 6-way join; nation/region/
    supplier broadcast, customer⋈orders and orders⋈lineitem shuffle."""
    customer, orders, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region.filter(F.col("r_name") == "ASIA"), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


# --------------------------------------------------------------------- q06
@register(
    "tpch_q06",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def tpch_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue forecast (reference q06.sql): pure scan+filter+ungrouped agg.
    All 4 predicates push to the parquet reader (PushedFilters)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


# --------------------------------------------------------------------- q07
@register(
    "tpch_q07",
    oracle="""
SELECT supp_nation, cust_nation, l_year, CAST(ROUND(SUM(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def tpch_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (reference q07.sql) between two nations."""
    supplier, lineitem, orders, customer, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    df = (
        supplier.join(lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
            )
            & F.col("l_shipdate").between("1996-01-01", "1997-12-31")
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
    )
    return (
        df.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(money_sum(F.col("volume"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------- q08
@register(
    "tpch_q08",
    oracle="""
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) / SUM(volume), 4) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def tpch_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (reference q08.sql)."""
    part, lineitem, supplier, orders, customer, nation, region = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer", "nation", "region"
    )
    n1 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    df = (
        part.filter(F.col("p_type") == "STANDARD")
        .join(lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderdate").between("1996-01-01", "1997-12-31"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("c_nk"))
        .join(region.filter(F.col("r_name") == "AMERICA"), F.col("c_rk") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
    )
    return (
        df.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------- q09
@register(
    "tpch_q09",
    oracle="""
SELECT nation, o_year, CAST(ROUND(SUM(CAST(amount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%green%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def tpch_q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (reference q09.sql; amount adapted — fixture has
    no partsupp.ps_supplycost)."""
    part, lineitem, supplier, orders, nation = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    return (
        part.filter(F.col("p_name").like("%green%"))
        .join(lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(money_sum(F.col("amount"), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------- q10
@register(
    "tpch_q10",
    oracle="""
SELECT c_custkey, c_name, CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       ROUND(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (reference q10.sql), top 20 by lost revenue."""
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01"))
        .join(lineitem.filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------- q12
@register(
    "tpch_q12",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority (reference q12.sql; grouped by returnflag —
    the fixture has no l_shipmode)."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------- q13
@register(
    "tpch_q13",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (reference q13.sql)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------- q14
@register(
    "tpch_q14",
    oracle="""
SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (reference q14.sql). part broadcasts."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter((F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------- q15
@register(
    "tpch_q15",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (reference q15.sql): CTE + scalar-subquery max.
    Implemented with a window max to avoid a second scan — Catalyst computes
    the max alongside (single shuffle, no driver round-trip)."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue"))
    )
    w = Window.partitionBy()  # global max, computed in one pass
    best = revenue.withColumn("max_rev", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        supplier.join(best, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------- q17
@register(
    "tpch_q17",
    oracle="""
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#11'
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (reference q17.sql): correlated scalar
    subquery → per-part window average (one shuffle on partkey instead of a
    self-join — the decorrelation DuckDB's flatten_dependent_join performs)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    w = Window.partitionBy("l_partkey")
    enriched = lineitem.join(
        part.filter(F.col("p_brand") == "Brand#11"), F.col("p_partkey") == F.col("l_partkey")
    )
    # NOTE: window avg must be over *all* lineitems of the part, not just the
    # brand-filtered join — compute on lineitem first, then join.
    avg_by_part = lineitem.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        enriched.join(avg_by_part, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------- q18
@register(
    "tpch_q18",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
       ROUND(o_totalprice, 2) AS totalprice, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (reference q18.sql): IN-subquery → semi join.

    Single-pass formulation: the outer query's GROUP BY (customer, order)
    re-sums l_quantity over exactly the lineitem rows of each qualifying
    order — which is the per-order total the IN-subquery already computed.
    So aggregate lineitem ONCE, filter > 150, and join orders/customer to
    the aggregate (one lineitem shuffle instead of two + no second 5-key
    aggregation; sf1: 9.3 → 2.4 s). Orders⋈big is a hash join on the small
    filtered aggregate; customer joins on custkey."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("tot_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------- q19
@register(
    "tpch_q19",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (reference q19.sql): OR-of-ANDs join predicate."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    df = lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
    c1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11)
    c2 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20)
    c3 = (F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30)
    return df.filter(c1 | c2 | c3).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
    )


# --------------------------------------------------------------------- q21
@register(
    "tpch_q21",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (reference q21.sql, adapted to
    l_shipdate — fixture lacks commit/receipt dates).

    Rewritten from semi+anti self-joins (three lineitem-scale shuffles on
    l_orderkey) to ONE shuffle + per-order window aggregates: a row l1
    satisfies the EXISTS iff its order has >1 distinct supplier
    (min supplier != max supplier), and the NOT EXISTS iff
    l1.shipdate >= max shipdate among OTHER suppliers, where that
    other-supplier max is m1 = max(shipdate) when l1 is not the argmax
    supplier, else m2 = max(shipdate over suppliers != argmax supplier).
    Tie safety: when several suppliers achieve m1, m2 equals m1 by
    definition (some non-argmax supplier is at the max), so no separate
    multi-at-max branch is needed. r12: replaced the two collect_set
    windows (hash-set build per order in WindowExec) with min/max
    aggregates — same rows, measured 5.3s -> 1.9s at sf1 on the r12 host;
    plan diff: collect_set×2 removed from the Window nodes."""
    supplier, lineitem, orders = _t(spark, sf_dir, "supplier", "lineitem", "orders")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    w = Window.partitionBy("l_orderkey")
    enr = li.select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        F.min("l_suppkey").over(w).alias("s_min"),
        F.max("l_suppkey").over(w).alias("s_max"),
        F.max("l_shipdate").over(w).alias("m1"),
        F.expr("max_by(l_suppkey, l_shipdate)").over(w).alias("s_star"),
    )
    second = F.max(
        F.when(F.col("l_suppkey") != F.col("s_star"), F.col("l_shipdate"))
    ).over(w)
    enr2 = enr.select("*", second.alias("second"))
    m_other = F.when(
        F.col("l_suppkey") != F.col("s_star"), F.col("m1")
    ).otherwise(F.col("second"))
    qualified = enr2.filter(
        (F.col("s_min") != F.col("s_max"))
        & (m_other.isNull() | (F.col("l_shipdate") >= m_other))
    ).select("l_orderkey", "l_suppkey")
    return (
        qualified.join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------- q22
@register(
    "tpch_q22",
    oracle="""
SELECT c_nationkey AS cntry, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9)
  AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                   WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY cntry
""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (reference q22.sql; country code → nationkey
    since the fixture has no c_phone). Scalar subquery broadcasts; NOT
    EXISTS → anti join."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    nations = [1, 3, 5, 7, 9]
    pool = customer.filter(F.col("c_nationkey").isin(nations))
    avg_bal = pool.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("cntry")
    )
