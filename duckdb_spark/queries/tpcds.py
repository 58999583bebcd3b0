"""TPC-DS workload slice (reference `extension/tpcds/`, BASELINE.md
secondary gate): the 10 most join-heavy query shapes, run from ONE SQL text
per query through both engines — Spark via our dialect layer
(`sql.dialect.translate` → Catalyst) and DuckDB via the oracle string.

Reference query text: `extension/tpcds/dsdgen/queries/NN.sql` (adapted:
aggregates aliased + cast to rounded doubles so the driver's value-hash
compares engine-independent numbers; every table ref aliased so the oracle
can substitute read_parquet sources).

Fixture: the official dsdgen is C code the reference builds natively; here
a deterministic arithmetic fixture (same schema, `dsdgen/schema/*.sql`)
is generated on demand into /tmp — pure hash arithmetic, no RNG, so both
engines and every rerun see byte-identical tables. Row counts ≈ sf0.01.
Predicate constants in the reference queries (i_manufact_id=128, d_moy=11,
cd_gender='M', s_state='TN', s_store_name='ese', …) are covered by the
dimension value cycles by construction.

Scale posture: all 10 are star joins — Catalyst broadcasts every dim
(item/store/date_dim/… are far under the 16 MB threshold at any SF; at
100 TB the fact tables shuffle only for the final group-by, and the
ss⋈sr⋈cs chains in q25/q29 hash-join on (customer, item[, ticket]) keys
sized by AQE).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from duckdb_spark.queries import register

# v2: customer gained c_salutation/c_preferred_cust_flag for q34/q73 —
# new path so stale fixtures regenerate
TPCDS_DIR = os.environ.get("SPARK_GRAFT_TPCDS_DIR", "/tmp/duckdb_spark_tpcds_v2")

TABLES = [
    "date_dim", "time_dim", "item", "store", "customer", "customer_address",
    "customer_demographics", "household_demographics", "promotion",
    "store_sales", "store_returns", "catalog_sales",
]

_GEN_SQL = """
CREATE OR REPLACE TABLE date_dim AS
SELECT i + 1 AS d_date_sk,
       DATE '1998-01-01' + INTERVAL (i) DAY AS d_date,
       year(DATE '1998-01-01' + INTERVAL (i) DAY) AS d_year,
       month(DATE '1998-01-01' + INTERVAL (i) DAY) AS d_moy,
       day(DATE '1998-01-01' + INTERVAL (i) DAY) AS d_dom,
       quarter(DATE '1998-01-01' + INTERVAL (i) DAY) AS d_qoy,
       dayofweek(DATE '1998-01-01' + INTERVAL (i) DAY) AS d_dow
FROM range(1826) t(i);

CREATE OR REPLACE TABLE time_dim AS
SELECT i AS t_time_sk, (i // 3600)::INT AS t_hour,
       ((i % 3600) // 60)::INT AS t_minute, (i % 60)::INT AS t_second
FROM range(86400) t(i);

CREATE OR REPLACE TABLE item AS
SELECT i + 1 AS i_item_sk,
       'ITEM' || lpad((i + 1)::VARCHAR, 6, '0') AS i_item_id,
       'description of item ' || (i + 1) AS i_item_desc,
       1 + (i * 7) % 251 AS i_brand_id,
       'brand#' || (1 + (i * 7) % 251) AS i_brand,
       1 + i % 500 AS i_manufact_id,
       'manufact#' || (1 + i % 500) AS i_manufact,
       1 + (i * 13) % 100 AS i_manager_id,
       1 + (i * 3) % 7 AS i_category_id,
       'category#' || (1 + (i * 3) % 7) AS i_category,
       1 + (i * 11) % 19 AS i_class_id,
       'class#' || (1 + (i * 11) % 19) AS i_class,
       CAST(1 + (i * 7919 % 9000) / 100.0 AS DECIMAL(7,2)) AS i_current_price
FROM range(2000) t(i);

CREATE OR REPLACE TABLE store AS
SELECT i + 1 AS s_store_sk,
       'ST' || lpad((i + 1)::VARCHAR, 4, '0') AS s_store_id,
       ['ese', 'ose', 'ation', 'bar'][1 + i % 4] AS s_store_name,
       ['Fairview', 'Midway', 'Plainview', 'Centerville'][1 + i % 4] AS s_city,
       ['TN', 'KY', 'GA'][1 + i % 3] AS s_state,
       lpad((38000 + i * 701)::VARCHAR, 5, '0') AS s_zip,
       'county#' || (1 + i % 5) AS s_county
FROM range(12) t(i);

CREATE OR REPLACE TABLE customer AS
SELECT i + 1 AS c_customer_sk,
       'CUST' || lpad((i + 1)::VARCHAR, 8, '0') AS c_customer_id,
       ['Ann','Ben','Cara','Dan','Eva','Finn','Gia','Hank',
        'Iris','Jack','Kira','Liam','Mona','Nick','Omar','Pia'][1 + i % 16]
           AS c_first_name,
       ['Smith','Jones','Lee','Patel','Kim','Garcia','Chen','Olsen',
        'Singh','Brown','Rossi','Novak','Sato','Khan','Diaz','Weber'][1 + (i * 7) % 16]
           AS c_last_name,
       1 + (i * 3) % 5000 AS c_current_addr_sk,
       1 + (i * 11) % 280 AS c_current_cdemo_sk,
       1 + (i * 13) % 200 AS c_current_hdemo_sk,
       ['Mr.','Mrs.','Ms.','Dr.','Sir'][1 + (i * 7) % 5] AS c_salutation,
       ['Y','N'][1 + i % 2] AS c_preferred_cust_flag
FROM range(5000) t(i);

CREATE OR REPLACE TABLE customer_address AS
SELECT i + 1 AS ca_address_sk,
       ['Fairview','Midway','Plainview','Centerville','Oakland','Riverside',
        'Lakeview','Georgetown','Springdale','Ashland','Oak Grove','Antioch',
        'Clinton','Greenville','Bethel','Union','Salem','Enterprise',
        'Friendship','Glendale'][1 + (i * 17) % 20] AS ca_city,
       'county#' || (1 + i % 30) AS ca_county,
       ['TN','KY','GA','AL','VA','NC','SC','OH'][1 + (i * 3) % 8] AS ca_state,
       lpad((10000 + (i * 37) % 90000)::VARCHAR, 5, '0') AS ca_zip,
       'United States' AS ca_country
FROM range(5000) t(i);

CREATE OR REPLACE TABLE customer_demographics AS
SELECT i + 1 AS cd_demo_sk,
       ['M', 'F'][1 + i % 2] AS cd_gender,
       ['S', 'M', 'D', 'W', 'U'][1 + (i // 2) % 5] AS cd_marital_status,
       ['Primary', 'Secondary', 'College', '2 yr Degree', '4 yr Degree',
        'Advanced Degree', 'Unknown'][1 + (i // 10) % 7] AS cd_education_status,
       500 * (1 + i % 20) AS cd_purchase_estimate,
       ['Good', 'Low Risk', 'High Risk', 'Unknown'][1 + i % 4] AS cd_credit_rating,
       (i // 70) % 4 AS cd_dep_count
FROM range(280) t(i);

CREATE OR REPLACE TABLE household_demographics AS
SELECT i + 1 AS hd_demo_sk,
       1 + i % 20 AS hd_income_band_sk,
       ['>10000', '5001-10000', '1001-5000', '501-1000', '0-500'][1 + i % 5]
           AS hd_buy_potential,
       i % 10 AS hd_dep_count,
       (i // 2) % 5 AS hd_vehicle_count
FROM range(200) t(i);

CREATE OR REPLACE TABLE promotion AS
SELECT i + 1 AS p_promo_sk,
       'PROMO' || lpad((i + 1)::VARCHAR, 4, '0') AS p_promo_id,
       ['N', 'Y'][1 + i % 2] AS p_channel_dmail,
       ['N', 'Y'][1 + (i // 2) % 2] AS p_channel_email,
       ['N', 'Y'][1 + (i // 4) % 2] AS p_channel_event
FROM range(30) t(i);

CREATE OR REPLACE TABLE store_sales AS
SELECT 1 + (i * 37) % 1826 AS ss_sold_date_sk,
       (i * 101) % 86400 AS ss_sold_time_sk,
       1 + (i * 13) % 2000 AS ss_item_sk,
       1 + (i * 7) % 5000 AS ss_customer_sk,
       1 + (i * 11) % 280 AS ss_cdemo_sk,
       1 + (i * 17) % 200 AS ss_hdemo_sk,
       1 + (i * 23) % 5000 AS ss_addr_sk,
       1 + i % 12 AS ss_store_sk,
       1 + (i * 5) % 30 AS ss_promo_sk,
       1 + i // 3 AS ss_ticket_number,
       1 + (i * 3) % 99 AS ss_quantity,
       CAST(1 + (i * 7919 % 9000) / 100.0 AS DECIMAL(7,2)) AS ss_list_price,
       CAST(1 + (i * 6101 % 8000) / 100.0 AS DECIMAL(7,2)) AS ss_sales_price,
       CAST(1 + (i * 4507 % 900000) / 100.0 AS DECIMAL(7,2)) AS ss_ext_sales_price,
       CAST(1 + (i * 5309 % 990000) / 100.0 AS DECIMAL(7,2)) AS ss_ext_list_price,
       CAST((i * 3571 % 80000) / 100.0 AS DECIMAL(7,2)) AS ss_ext_tax,
       CAST((i * 2903 % 3000) / 100.0 AS DECIMAL(7,2)) AS ss_coupon_amt,
       CAST(1 + (i * 6983 % 900000) / 100.0 AS DECIMAL(7,2)) AS ss_net_paid,
       CAST(((i * 104729) % 20000 - 10000) / 100.0 AS DECIMAL(7,2)) AS ss_net_profit
FROM range(120000) t(i);

CREATE OR REPLACE TABLE store_returns AS
SELECT DISTINCT
       ss_item_sk AS sr_item_sk,
       ss_customer_sk AS sr_customer_sk,
       ss_ticket_number AS sr_ticket_number,
       ss_store_sk AS sr_store_sk,
       LEAST(1826, ss_sold_date_sk + 45) AS sr_returned_date_sk,
       1 + (ss_item_sk * 3 + ss_ticket_number) % 20 AS sr_return_quantity,
       CAST(1 + ((ss_item_sk * 131 + ss_ticket_number * 17) % 50000) / 100.0
            AS DECIMAL(7,2)) AS sr_return_amt,
       CAST(1 + ((ss_item_sk * 89 + ss_ticket_number * 29) % 40000) / 100.0
            AS DECIMAL(7,2)) AS sr_net_loss
FROM store_sales
WHERE (ss_item_sk + ss_ticket_number) % 9 = 0;

CREATE OR REPLACE TABLE catalog_sales AS
SELECT LEAST(1826, ss_sold_date_sk + 60) AS cs_sold_date_sk,
       ss_item_sk AS cs_item_sk,
       ss_customer_sk AS cs_bill_customer_sk,
       1 + (ss_item_sk * 11 + ss_customer_sk) % 280 AS cs_bill_cdemo_sk,
       1 + (ss_item_sk * 5 + ss_customer_sk) % 30 AS cs_promo_sk,
       1 + (ss_item_sk * 3 + ss_customer_sk) % 99 AS cs_quantity,
       CAST(1 + ((ss_item_sk * 7919 + ss_customer_sk) % 9000) / 100.0
            AS DECIMAL(7,2)) AS cs_list_price,
       CAST(1 + ((ss_item_sk * 6101 + ss_customer_sk) % 8000) / 100.0
            AS DECIMAL(7,2)) AS cs_sales_price,
       CAST(((ss_item_sk * 2903 + ss_customer_sk) % 3000) / 100.0
            AS DECIMAL(7,2)) AS cs_coupon_amt,
       CAST(1 + ((ss_item_sk * 4507 + ss_customer_sk) % 900000) / 100.0
            AS DECIMAL(7,2)) AS cs_ext_sales_price,
       CAST((((ss_item_sk * 104729 + ss_customer_sk) % 20000) - 10000) / 100.0
            AS DECIMAL(7,2)) AS cs_net_profit
FROM (SELECT DISTINCT ss_sold_date_sk, ss_item_sk, ss_customer_sk
      FROM store_sales WHERE (ss_item_sk * 31 + ss_customer_sk) % 7 = 0)
UNION ALL
SELECT 1 + (i * 41) % 1826, 1 + (i * 19) % 2000, 1 + (i * 3) % 5000,
       1 + (i * 13) % 280, 1 + (i * 7) % 30, 1 + (i * 5) % 99,
       CAST(1 + (i * 7919 % 9000) / 100.0 AS DECIMAL(7,2)),
       CAST(1 + (i * 6101 % 8000) / 100.0 AS DECIMAL(7,2)),
       CAST((i * 2903 % 3000) / 100.0 AS DECIMAL(7,2)),
       CAST(1 + (i * 4507 % 900000) / 100.0 AS DECIMAL(7,2)),
       CAST(((i * 104729 % 20000) - 10000) / 100.0 AS DECIMAL(7,2))
FROM range(60000) t(i);
"""


def ensure_fixture(out_dir: str = TPCDS_DIR) -> str:
    """Generate the TPC-DS fixture if missing (deterministic; idempotent)."""
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return out_dir
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(_GEN_SQL)
    for t in TABLES:
        con.execute(f"COPY {t} TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    open(marker, "w").write("ok\n")
    return out_dir


def _oracle(sql: str) -> str:
    return sql.format(**{t: f"read_parquet('{TPCDS_DIR}/{t}.parquet')" for t in TABLES})


def _spark_run(spark: SparkSession, sql: str) -> DataFrame:
    from duckdb_spark.sql.dialect import translate

    ensure_fixture()
    for t in TABLES:
        spark.read.parquet(f"{TPCDS_DIR}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(translate(sql.format(**{t: t for t in TABLES})))


def _tpcds(name: str, sql: str):
    @register(name, oracle=_oracle(sql))
    def q(spark: SparkSession, sf_dir: str, _sql=sql) -> DataFrame:  # noqa: ARG001
        """TPC-DS over the deterministic fixture (sf_dir unused: TPC-DS has
        its own schema; reference extension/tpcds/dsdgen)."""
        return _spark_run(spark, _sql)

    q.__name__ = name
    return q


# q3 — star join, month/manufacturer slice (queries/03.sql)
_tpcds("tpcds_q03", """
SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
       ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS sum_agg
FROM {date_dim} dt, {store_sales} store_sales, {item} item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manufact_id = 128 AND dt.d_moy = 11
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
ORDER BY dt.d_year, sum_agg DESC, brand_id
LIMIT 100
""")

# q7 — 4-dim star with demographic/promo filters (07.sql)
_tpcds("tpcds_q07", """
SELECT i_item_id,
       ROUND(CAST(SUM(ss_quantity) AS DOUBLE) / COUNT(ss_quantity), 2) AS agg1,
       ROUND(CAST(SUM(ss_list_price) AS DOUBLE) / COUNT(ss_list_price), 2) AS agg2,
       ROUND(CAST(SUM(ss_coupon_amt) AS DOUBLE) / COUNT(ss_coupon_amt), 2) AS agg3,
       ROUND(CAST(SUM(ss_sales_price) AS DOUBLE) / COUNT(ss_sales_price), 2) AS agg4
FROM {store_sales} store_sales, {customer_demographics} customer_demographics,
     {date_dim} date_dim, {item} item, {promotion} promotion
WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N') AND d_year = 2000
GROUP BY i_item_id ORDER BY i_item_id LIMIT 100
""")

# q19 — 6-table star with zip-mismatch predicate (19.sql)
_tpcds("tpcds_q19", """
SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id, i_manufact,
       ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS ext_price
FROM {date_dim} date_dim, {store_sales} store_sales, {item} item,
     {customer} customer, {customer_address} customer_address, {store} store
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 8 AND d_moy = 11 AND d_year = 1998
  AND ss_customer_sk = c_customer_sk AND c_current_addr_sk = ca_address_sk
  AND SUBSTRING(ca_zip, 1, 5) <> SUBSTRING(s_zip, 1, 5)
  AND ss_store_sk = s_store_sk
GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
ORDER BY ext_price DESC, i_brand, i_brand_id, i_manufact_id, i_manufact
LIMIT 100
""")

# q25 — ss ⋈ sr ⋈ cs fact chain on (customer, item, ticket) (25.sql)
_tpcds("tpcds_q25", """
SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       ROUND(CAST(SUM(ss_net_profit) AS DOUBLE), 2) AS store_sales_profit,
       ROUND(CAST(SUM(sr_net_loss) AS DOUBLE), 2) AS store_returns_loss,
       ROUND(CAST(SUM(cs_net_profit) AS DOUBLE), 2) AS catalog_sales_profit
FROM {store_sales} store_sales, {store_returns} store_returns,
     {catalog_sales} catalog_sales, {date_dim} d1, {date_dim} d2,
     {date_dim} d3, {store} store, {item} item
WHERE d1.d_moy = 4 AND d1.d_year = 2001 AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_moy BETWEEN 4 AND 10 AND d2.d_year = 2001
  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_moy BETWEEN 4 AND 10 AND d3.d_year = 2001
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100
""")

# q26 — catalog-side demographic star (26.sql)
_tpcds("tpcds_q26", """
SELECT i_item_id,
       ROUND(CAST(SUM(cs_quantity) AS DOUBLE) / COUNT(cs_quantity), 2) AS agg1,
       ROUND(CAST(SUM(cs_list_price) AS DOUBLE) / COUNT(cs_list_price), 2) AS agg2,
       ROUND(CAST(SUM(cs_coupon_amt) AS DOUBLE) / COUNT(cs_coupon_amt), 2) AS agg3,
       ROUND(CAST(SUM(cs_sales_price) AS DOUBLE) / COUNT(cs_sales_price), 2) AS agg4
FROM {catalog_sales} catalog_sales, {customer_demographics} customer_demographics,
     {date_dim} date_dim, {item} item, {promotion} promotion
WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd_demo_sk AND cs_promo_sk = p_promo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N') AND d_year = 2000
GROUP BY i_item_id ORDER BY i_item_id LIMIT 100
""")

# q29 — quantity version of the fact chain (29.sql)
_tpcds("tpcds_q29", """
SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       ROUND(CAST(SUM(ss_quantity) AS DOUBLE), 2) AS store_sales_quantity,
       ROUND(CAST(SUM(sr_return_quantity) AS DOUBLE), 2) AS store_returns_quantity,
       ROUND(CAST(SUM(cs_quantity) AS DOUBLE), 2) AS catalog_sales_quantity
FROM {store_sales} store_sales, {store_returns} store_returns,
     {catalog_sales} catalog_sales, {date_dim} d1, {date_dim} d2,
     {date_dim} d3, {store} store, {item} item
WHERE d1.d_moy = 9 AND d1.d_year = 1999 AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_moy BETWEEN 9 AND 9 + 3 AND d2.d_year = 1999
  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_year IN (1999, 1999 + 1, 1999 + 2)
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100
""")

# q42 — category slice (42.sql)
_tpcds("tpcds_q42", """
SELECT dt.d_year, item.i_category_id, item.i_category,
       ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS sum_sales
FROM {date_dim} dt, {store_sales} store_sales, {item} item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1 AND dt.d_moy = 11 AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_category_id, item.i_category
ORDER BY sum_sales DESC, dt.d_year, item.i_category_id, item.i_category
LIMIT 100
""")

# q55 — brand slice (55.sql shape: manager 28, moy 11, year 1999)
_tpcds("tpcds_q55", """
SELECT i_brand_id AS brand_id, i_brand AS brand,
       ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS ext_price
FROM {date_dim} date_dim, {store_sales} store_sales, {item} item
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 28 AND d_moy = 11 AND d_year = 1999
GROUP BY i_brand, i_brand_id
ORDER BY ext_price DESC, brand_id
LIMIT 100
""")

# q1 — CTE + correlated scalar subquery (decorrelation; 01.sql)
_tpcds("tpcds_q01", """
WITH customer_total_return AS
  (SELECT sr_customer_sk AS ctr_customer_sk, sr_store_sk AS ctr_store_sk,
          SUM(sr_return_amt) AS ctr_total_return
   FROM {store_returns} store_returns, {date_dim} date_dim
   WHERE sr_returned_date_sk = d_date_sk AND d_year = 2000
   GROUP BY sr_customer_sk, sr_store_sk)
SELECT c_customer_id
FROM customer_total_return ctr1, {store} store, {customer} customer
WHERE ctr1.ctr_total_return >
    (SELECT AVG(ctr_total_return) * 1.2 FROM customer_total_return ctr2
     WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
  AND s_store_sk = ctr1.ctr_store_sk AND s_state = 'TN'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id
LIMIT 100
""")

# q96 — selective count over time/demographic dims (96.sql)
_tpcds("tpcds_q96", """
SELECT COUNT(*) AS cnt
FROM {store_sales} store_sales, {household_demographics} household_demographics,
     {time_dim} time_dim, {store} store
WHERE ss_sold_time_sk = time_dim.t_time_sk
  AND ss_hdemo_sk = household_demographics.hd_demo_sk
  AND ss_store_sk = s_store_sk
  AND time_dim.t_hour = 20 AND time_dim.t_minute >= 30
  AND household_demographics.hd_dep_count = 7
  AND store.s_store_name = 'ese'
""")

# ---- round-5 expansion: 9 more query shapes (constants adapted to the
# fixture's value cycles, as documented in the module header) ----

# q15 — catalog sales by zip with OR-of-predicates (15.sql)
_tpcds("tpcds_q15", """
SELECT ca_zip, ROUND(CAST(SUM(cs_sales_price) AS DOUBLE), 2) AS sum_sales
FROM {catalog_sales} catalog_sales, {customer} customer,
     {customer_address} customer_address, {date_dim} date_dim
WHERE cs_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND (SUBSTRING(ca_zip, 1, 5) IN ('10037', '10074', '10111', '23456')
       OR ca_state IN ('GA', 'VA', 'NC')
       OR cs_sales_price > 50)
  AND cs_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2001
GROUP BY ca_zip
ORDER BY ca_zip NULLS FIRST
LIMIT 100
""")

# q34 — ticket-count band join back to customer (34.sql)
_tpcds("tpcds_q34", """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM
  (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
   FROM {store_sales} store_sales, {date_dim} date_dim, {store} store,
        {household_demographics} household_demographics
   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
     AND store_sales.ss_store_sk = store.s_store_sk
     AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
     AND (date_dim.d_dom BETWEEN 1 AND 3 OR date_dim.d_dom BETWEEN 25 AND 28)
     AND (household_demographics.hd_buy_potential = '>10000'
          OR household_demographics.hd_buy_potential = '1001-5000')
     AND household_demographics.hd_vehicle_count > 0
     AND (CASE WHEN household_demographics.hd_vehicle_count > 0
               THEN (household_demographics.hd_dep_count * 1.000)
                    / household_demographics.hd_vehicle_count
               ELSE NULL END) > 1.2
     AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
     AND store.s_county = 'county#1'
   GROUP BY ss_ticket_number, ss_customer_sk) dn, {customer} customer
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 5
ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST,
         c_salutation NULLS FIRST, c_preferred_cust_flag DESC NULLS FIRST,
         ss_ticket_number NULLS FIRST, cnt
LIMIT 100
""")

# q48 — OR-of-conjunction demographic/address bands (48.sql)
_tpcds("tpcds_q48", """
SELECT CAST(SUM(ss_quantity) AS BIGINT) AS sum_qty
FROM {store_sales} store_sales, {store} store,
     {customer_demographics} customer_demographics,
     {customer_address} customer_address, {date_dim} date_dim
WHERE s_store_sk = ss_store_sk AND ss_sold_date_sk = d_date_sk
  AND d_year = 2000
  AND ((cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'M'
        AND cd_education_status = '4 yr Degree'
        AND ss_sales_price BETWEEN 10.00 AND 30.00)
       OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'D'
           AND cd_education_status = '2 yr Degree'
           AND ss_sales_price BETWEEN 30.00 AND 50.00)
       OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'S'
           AND cd_education_status = 'College'
           AND ss_sales_price BETWEEN 50.00 AND 70.00))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TN', 'KY', 'GA') AND ss_net_profit BETWEEN 0 AND 50)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('AL', 'VA', 'NC') AND ss_net_profit BETWEEN 10 AND 80)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('SC', 'OH', 'TN') AND ss_net_profit BETWEEN -100 AND 100))
""")

# q61 — promoted-vs-total ratio via two scalar aggregates (61.sql)
_tpcds("tpcds_q61", """
SELECT promotions, total,
       ROUND(CAST(promotions AS DOUBLE) / CAST(total AS DOUBLE) * 100, 4)
           AS promo_pct
FROM
  (SELECT ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS promotions
   FROM {store_sales} store_sales, {store} store, {promotion} promotion,
        {date_dim} date_dim, {customer} customer,
        {customer_address} customer_address, {item} item
   WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
     AND ss_promo_sk = p_promo_sk AND ss_customer_sk = c_customer_sk
     AND ca_address_sk = c_current_addr_sk AND ss_item_sk = i_item_sk
     AND ca_state = 'TN' AND i_category = 'category#3'
     AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y' OR p_channel_event = 'Y')
     AND d_year = 2000 AND d_moy = 11) promotional_sales,
  (SELECT ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS total
   FROM {store_sales} store_sales, {store} store, {date_dim} date_dim,
        {customer} customer, {customer_address} customer_address, {item} item
   WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
     AND ss_customer_sk = c_customer_sk AND ca_address_sk = c_current_addr_sk
     AND ss_item_sk = i_item_sk AND ca_state = 'TN'
     AND i_category = 'category#3' AND d_year = 2000 AND d_moy = 11) all_sales
""")

# q68 — bought-city vs home-city mismatch (68.sql)
_tpcds("tpcds_q68", """
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       extended_price, extended_tax, list_price
FROM
  (SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
          ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS extended_price,
          ROUND(CAST(SUM(ss_ext_list_price) AS DOUBLE), 2) AS list_price,
          ROUND(CAST(SUM(ss_ext_tax) AS DOUBLE), 2) AS extended_tax
   FROM {store_sales} store_sales, {date_dim} date_dim, {store} store,
        {household_demographics} household_demographics,
        {customer_address} customer_address
   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
     AND store_sales.ss_store_sk = store.s_store_sk
     AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
     AND store_sales.ss_addr_sk = customer_address.ca_address_sk
     AND date_dim.d_dom BETWEEN 1 AND 2
     AND (household_demographics.hd_dep_count = 5
          OR household_demographics.hd_vehicle_count = 3)
     AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
     AND store.s_city IN ('Fairview', 'Midway')
   GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
  {customer} customer, {customer_address} current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name NULLS FIRST, ss_ticket_number NULLS FIRST,
         c_first_name, bought_city, extended_price
LIMIT 100
""")

# q73 — ticket-count band, household slice (73.sql)
_tpcds("tpcds_q73", """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM
  (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
   FROM {store_sales} store_sales, {date_dim} date_dim, {store} store,
        {household_demographics} household_demographics
   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
     AND store_sales.ss_store_sk = store.s_store_sk
     AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
     AND date_dim.d_dom BETWEEN 1 AND 2
     AND (household_demographics.hd_buy_potential = '>10000'
          OR household_demographics.hd_buy_potential = '0-500')
     AND household_demographics.hd_vehicle_count > 0
     AND CASE WHEN household_demographics.hd_vehicle_count > 0
              THEN household_demographics.hd_dep_count * 1.0
                   / household_demographics.hd_vehicle_count
              ELSE NULL END > 1
     AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
     AND store.s_county = 'county#2'
   GROUP BY ss_ticket_number, ss_customer_sk) dj, {customer} customer
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, c_last_name ASC, c_first_name, c_salutation,
         ss_ticket_number
LIMIT 100
""")

# q79 — per-customer-ticket profit with city detail (79.sql; the
# s_number_of_employees predicate has no fixture column and is dropped)
_tpcds("tpcds_q79", """
SELECT c_last_name, c_first_name,
       SUBSTRING(s_city, 1, 30) AS city30, ss_ticket_number, amt, profit
FROM
  (SELECT ss_ticket_number, ss_customer_sk, store.s_city,
          ROUND(CAST(SUM(ss_coupon_amt) AS DOUBLE), 2) AS amt,
          ROUND(CAST(SUM(ss_net_profit) AS DOUBLE), 2) AS profit
   FROM {store_sales} store_sales, {date_dim} date_dim, {store} store,
        {household_demographics} household_demographics
   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
     AND store_sales.ss_store_sk = store.s_store_sk
     AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
     AND (household_demographics.hd_dep_count = 8
          OR household_demographics.hd_vehicle_count > 3)
     AND date_dim.d_dow = 1
     AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
   GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city) ms,
  {customer} customer
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, city30, profit, ss_ticket_number, amt
LIMIT 100
""")

# q88 — eight half-hour traffic counters cross-joined (88.sql)
_tpcds("tpcds_q88", """
SELECT h8_30_to_9 AS c1, h9_to_9_30 AS c2, h9_30_to_10 AS c3,
       h10_to_10_30 AS c4
FROM
 (SELECT COUNT(*) AS h8_30_to_9
  FROM {store_sales} store_sales, {household_demographics} household_demographics,
       {time_dim} time_dim, {store} store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 8 AND time_dim.t_minute >= 30
    AND ((household_demographics.hd_dep_count = 4
          AND household_demographics.hd_vehicle_count <= 4 + 2)
         OR (household_demographics.hd_dep_count = 2
             AND household_demographics.hd_vehicle_count <= 2 + 2)
         OR (household_demographics.hd_dep_count = 0
             AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s1,
 (SELECT COUNT(*) AS h9_to_9_30
  FROM {store_sales} store_sales, {household_demographics} household_demographics,
       {time_dim} time_dim, {store} store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 9 AND time_dim.t_minute < 30
    AND ((household_demographics.hd_dep_count = 4
          AND household_demographics.hd_vehicle_count <= 4 + 2)
         OR (household_demographics.hd_dep_count = 2
             AND household_demographics.hd_vehicle_count <= 2 + 2)
         OR (household_demographics.hd_dep_count = 0
             AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s2,
 (SELECT COUNT(*) AS h9_30_to_10
  FROM {store_sales} store_sales, {household_demographics} household_demographics,
       {time_dim} time_dim, {store} store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 9 AND time_dim.t_minute >= 30
    AND ((household_demographics.hd_dep_count = 4
          AND household_demographics.hd_vehicle_count <= 4 + 2)
         OR (household_demographics.hd_dep_count = 2
             AND household_demographics.hd_vehicle_count <= 2 + 2)
         OR (household_demographics.hd_dep_count = 0
             AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s3,
 (SELECT COUNT(*) AS h10_to_10_30
  FROM {store_sales} store_sales, {household_demographics} household_demographics,
       {time_dim} time_dim, {store} store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 10 AND time_dim.t_minute < 30
    AND ((household_demographics.hd_dep_count = 4
          AND household_demographics.hd_vehicle_count <= 4 + 2)
         OR (household_demographics.hd_dep_count = 2
             AND household_demographics.hd_vehicle_count <= 2 + 2)
         OR (household_demographics.hd_dep_count = 0
             AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s4
""")

# q89 — rolling average over item/store months via a window (89.sql)
_tpcds("tpcds_q89", """
SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
       sum_sales, avg_monthly_sales
FROM
  (SELECT i_category, i_class, i_brand, s_store_name,
          'company#1' AS s_company_name, d_moy,
          ROUND(CAST(SUM(ss_sales_price) AS DOUBLE), 2) AS sum_sales,
          ROUND(CAST(AVG(SUM(ss_sales_price)) OVER (
              PARTITION BY i_category, i_brand, s_store_name
          ) AS DOUBLE), 2) AS avg_monthly_sales
   FROM {item} item, {store_sales} store_sales, {date_dim} date_dim,
        {store} store
   WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
     AND ss_store_sk = s_store_sk AND d_year = 1999
     AND i_category IN ('category#1', 'category#2', 'category#3')
     AND i_class IN ('class#1', 'class#2', 'class#3')
   GROUP BY i_category, i_class, i_brand, s_store_name, d_moy) tmp1
WHERE avg_monthly_sales <> 0
  AND ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
ORDER BY sum_sales - avg_monthly_sales, s_store_name, i_category, i_class,
         i_brand, d_moy
LIMIT 100
""")
