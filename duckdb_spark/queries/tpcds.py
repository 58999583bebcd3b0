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

TPCDS_DIR = os.environ.get("SPARK_GRAFT_TPCDS_DIR", "/tmp/duckdb_spark_tpcds")

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
       1 + (i * 13) % 200 AS c_current_hdemo_sk
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
