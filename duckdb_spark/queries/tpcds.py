"""TPC-DS workload slice (reference `extension/tpcds/`, BASELINE.md
secondary gate): 34 queries spanning star joins, OR-of-band demographic
filters, UNION-spelled rollups + rank windows, correlated count
subqueries, day-bucket pivots, windowed deviation-from-average, and
returns-chain statistics — each run from ONE SQL text per query through
both engines — Spark via our dialect layer (`sql.dialect.translate` →
Catalyst) and DuckDB via the oracle string.

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

# v3: date_dim gains d_month_seq/d_quarter_name/d_day_name, store gains
# address/company/gmt columns, item gains product/color/units/size/cost,
# store_sales gains wholesale costs, store_returns gains sr_reason_sk, and
# the reason table lands — for the q06..q98 expansion. New path so stale
# fixtures regenerate.
TPCDS_DIR = os.environ.get("SPARK_GRAFT_TPCDS_DIR", "/tmp/duckdb_spark_tpcds_v3")

TABLES = [
    "date_dim", "time_dim", "item", "store", "customer", "customer_address",
    "customer_demographics", "household_demographics", "promotion", "reason",
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
       dayofweek(DATE '1998-01-01' + INTERVAL (i) DAY) AS d_dow,
       -- real dsdgen numbering: month_seq 1200 = Jan 2000
       (d_year - 1900) * 12 + (d_moy - 1) AS d_month_seq,
       d_year || 'Q' || d_qoy AS d_quarter_name,
       dayname(d_date) AS d_day_name
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
       CAST(1 + (i * 7919 % 9000) / 100.0 AS DECIMAL(7,2)) AS i_current_price,
       CAST(1 + (i * 6101 % 8000) / 100.0 AS DECIMAL(7,2)) AS i_wholesale_cost,
       'name#' || (1 + (i * 5) % 97) AS i_product_name,
       ['powder','khaki','brown','honeydew','floral','deep','light',
        'cornflower','midnight','snow','cyan','papaya','orange','frosted',
        'forest','ghost','red','blue'][1 + (i * 7) % 18] AS i_color,
       ['Ounce','Oz','Bunch','Ton','N/A','Dozen','Box','Pound','Pallet',
        'Gross','Cup','Dram','Each','Tbl','Lb','Bundle'][1 + (i * 11) % 16]
           AS i_units,
       ['medium','extra large','N/A','small','petite','large'][1 + (i * 13) % 6]
           AS i_size
FROM range(2000) t(i);

CREATE OR REPLACE TABLE store AS
SELECT i + 1 AS s_store_sk,
       'ST' || lpad((i + 1)::VARCHAR, 4, '0') AS s_store_id,
       ['ese', 'ose', 'ation', 'bar'][1 + i % 4] AS s_store_name,
       ['Fairview', 'Midway', 'Plainview', 'Centerville'][1 + i % 4] AS s_city,
       ['TN', 'KY', 'GA'][1 + i % 3] AS s_state,
       lpad((38000 + i * 701)::VARCHAR, 5, '0') AS s_zip,
       'county#' || (1 + i % 5) AS s_county,
       1 + i % 2 AS s_company_id,
       'company#' || (1 + i % 2) AS s_company_name,
       (100 + i * 7)::VARCHAR AS s_street_number,
       ['Main','Oak','Elm','Park'][1 + i % 4] AS s_street_name,
       ['St','Ave','Blvd','Ln'][1 + (i * 3) % 4] AS s_street_type,
       'Suite ' || (10 * (1 + i % 9)) AS s_suite_number,
       -5 AS s_gmt_offset
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
       CAST(((i * 104729) % 20000 - 10000) / 100.0 AS DECIMAL(7,2)) AS ss_net_profit,
       CAST(1 + (i * 3109 % 9000) / 100.0 AS DECIMAL(7,2)) AS ss_wholesale_cost,
       CAST(1 + (i * 4001 % 800000) / 100.0 AS DECIMAL(7,2)) AS ss_ext_wholesale_cost
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
            AS DECIMAL(7,2)) AS sr_net_loss,
       1 + (ss_item_sk * 7 + ss_ticket_number * 3) % 35 AS sr_reason_sk
FROM store_sales
WHERE (ss_item_sk + ss_ticket_number) % 9 = 0;

CREATE OR REPLACE TABLE reason AS
SELECT i + 1 AS r_reason_sk,
       'R' || lpad((i + 1)::VARCHAR, 4, '0') AS r_reason_id,
       'reason ' || (i + 1) AS r_reason_desc
FROM range(35) t(i);

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


def fixture_dir(mult: int = 1) -> str:
    """Fixture path for a scale multiplier (1 = the base ~sf0.01 fixture,
    whose path the registered oracle strings bake in)."""
    return TPCDS_DIR if mult <= 1 else f"{TPCDS_DIR}_x{mult}"


def ensure_fixture(mult: int = 1) -> str:
    """Generate the TPC-DS fixture if missing (deterministic; idempotent).
    `mult` scales the fact tables (store_sales / its derived store_returns
    and catalog_sales) linearly while dimensions stay fixed — dsdgen
    semantics — so the bench at sf0.1/sf1 measures operator throughput
    instead of the two engines' per-job floors (VERDICT r05 item 2)."""
    out_dir = fixture_dir(mult)
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return out_dir
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    gen = _GEN_SQL.replace("range(120000)", f"range({120000 * mult})").replace(
        "range(60000)", f"range({60000 * mult})"
    )
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute(gen)
    for t in TABLES:
        con.execute(f"COPY {t} TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    open(marker, "w").write("ok\n")
    return out_dir


def _oracle(sql: str) -> str:
    return sql.format(**{t: f"read_parquet('{TPCDS_DIR}/{t}.parquet')" for t in TABLES})


def _spark_run(spark: SparkSession, sql: str, sf_dir: str = "") -> DataFrame:
    from duckdb_spark.queries import bench_scale_mult
    from duckdb_spark.sql.dialect import translate

    d = ensure_fixture(bench_scale_mult(sf_dir))
    for t in TABLES:
        spark.read.parquet(f"{d}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(translate(sql.format(**{t: t for t in TABLES})))


def _tpcds(name: str, sql: str):
    @register(name, oracle=_oracle(sql))
    def q(spark: SparkSession, sf_dir: str, _sql=sql) -> DataFrame:
        """TPC-DS over the deterministic fixture (fact tables scale with
        sf_dir; reference extension/tpcds/dsdgen)."""
        return _spark_run(spark, _sql, sf_dir)

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


# ---- round-5 second expansion: 15 more queries over the v3 fixture ----
# Same adaptation protocol: constants mapped into the fixture's value
# cycles, aggregates aliased + rounded doubles, tie-breakers appended.

# q06 — state rollup gated on a month-seq scalar subquery and a
# category-average price comparison (06.sql)
_tpcds("tpcds_q06", """
SELECT a.ca_state AS state, COUNT(*) AS cnt
FROM {customer_address} a, {customer} c, {store_sales} s,
     {date_dim} d, {item} i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk
  AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk
  AND d.d_month_seq =
    (SELECT DISTINCT (d_month_seq) FROM {date_dim} date_dim
     WHERE d_year = 2001 AND d_moy = 1)
  AND i.i_current_price > 1.2 *
    (SELECT ROUND(CAST(AVG(j.i_current_price) AS DOUBLE), 6)
     FROM {item} j WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING COUNT(*) >= 10
ORDER BY cnt NULLS FIRST, a.ca_state NULLS FIRST
LIMIT 100
""")

# q13 — three-way OR of demographic bands × three-way OR of address bands
# (13.sql; state lists and net-profit bands mapped to the fixture cycles)
_tpcds("tpcds_q13", """
SELECT ROUND(CAST(AVG(ss_quantity) AS DOUBLE), 2) AS avg1,
       ROUND(CAST(AVG(ss_ext_sales_price) AS DOUBLE), 2) AS avg2,
       ROUND(CAST(AVG(ss_ext_wholesale_cost) AS DOUBLE), 2) AS avg3,
       ROUND(CAST(SUM(ss_ext_wholesale_cost) AS DOUBLE), 2) AS sum4
FROM {store_sales} store_sales, {store} store,
     {customer_demographics} customer_demographics,
     {household_demographics} household_demographics,
     {customer_address} customer_address, {date_dim} date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk
  AND d_year = 2001
  AND ((ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'M' AND cd_education_status = 'Advanced Degree'
        AND ss_sales_price BETWEEN 50.00 AND 80.00 AND hd_dep_count = 3)
       OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
           AND cd_marital_status = 'S' AND cd_education_status = 'College'
           AND ss_sales_price BETWEEN 20.00 AND 50.00 AND hd_dep_count = 1)
       OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
           AND cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
           AND ss_sales_price BETWEEN 60.00 AND 81.00 AND hd_dep_count = 1))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TN', 'OH', 'KY') AND ss_net_profit BETWEEN 0 AND 100)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('GA', 'AL', 'VA') AND ss_net_profit BETWEEN -50 AND 50)
       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
           AND ca_state IN ('NC', 'SC', 'TN') AND ss_net_profit BETWEEN -100 AND 0))
""")

# q17 — quantity statistics across the ss→sr→cs chain over three date
# roles (17.sql; stddev/cov rounded for the hash compare)
_tpcds("tpcds_q17", """
SELECT i_item_id, i_item_desc, s_state,
       COUNT(ss_quantity) AS ss_qty_count,
       ROUND(CAST(AVG(ss_quantity) AS DOUBLE), 2) AS ss_qty_avg,
       ROUND(CAST(STDDEV_SAMP(ss_quantity) AS DOUBLE), 2) AS ss_qty_stdev,
       ROUND(CAST(STDDEV_SAMP(ss_quantity) / AVG(ss_quantity) AS DOUBLE), 2)
           AS ss_qty_cov,
       COUNT(sr_return_quantity) AS sr_qty_count,
       ROUND(CAST(AVG(sr_return_quantity) AS DOUBLE), 2) AS sr_qty_avg,
       ROUND(CAST(STDDEV_SAMP(sr_return_quantity) AS DOUBLE), 2) AS sr_qty_stdev,
       ROUND(CAST(STDDEV_SAMP(sr_return_quantity) / AVG(sr_return_quantity)
             AS DOUBLE), 2) AS sr_qty_cov,
       COUNT(cs_quantity) AS cs_qty_count,
       ROUND(CAST(AVG(cs_quantity) AS DOUBLE), 2) AS cs_qty_avg,
       ROUND(CAST(STDDEV_SAMP(cs_quantity) AS DOUBLE), 2) AS cs_qty_stdev,
       ROUND(CAST(STDDEV_SAMP(cs_quantity) / AVG(cs_quantity) AS DOUBLE), 2)
           AS cs_qty_cov
FROM {store_sales} store_sales, {store_returns} store_returns,
     {catalog_sales} catalog_sales, {date_dim} d1, {date_dim} d2,
     {date_dim} d3, {store} store, {item} item
WHERE d1.d_quarter_name = '2001Q1'
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
GROUP BY i_item_id, i_item_desc, s_state
ORDER BY i_item_id NULLS FIRST, i_item_desc NULLS FIRST, s_state NULLS FIRST
LIMIT 100
""")

# q27 — demographic item/state rollup via UNION ALL grouping levels
# (27.sql; the reference spells ROLLUP as explicit UNION ALL branches)
_tpcds("tpcds_q27", """
WITH results AS
  (SELECT i_item_id, s_state, ss_quantity AS agg1, ss_list_price AS agg2,
          ss_coupon_amt AS agg3, ss_sales_price AS agg4
   FROM {store_sales} store_sales, {customer_demographics} customer_demographics,
        {date_dim} date_dim, {store} store, {item} item
   WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
     AND ss_store_sk = s_store_sk AND ss_cdemo_sk = cd_demo_sk
     AND cd_gender = 'M' AND cd_marital_status = 'S'
     AND cd_education_status = 'College'
     AND d_year = 2002 AND s_state = 'TN')
SELECT i_item_id, s_state, g_state, agg1, agg2, agg3, agg4
FROM
  (SELECT i_item_id, s_state, 0 AS g_state,
          ROUND(CAST(AVG(agg1) AS DOUBLE), 2) AS agg1,
          ROUND(CAST(AVG(agg2) AS DOUBLE), 2) AS agg2,
          ROUND(CAST(AVG(agg3) AS DOUBLE), 2) AS agg3,
          ROUND(CAST(AVG(agg4) AS DOUBLE), 2) AS agg4
   FROM results GROUP BY i_item_id, s_state
   UNION ALL
   SELECT i_item_id, NULL AS s_state, 1 AS g_state,
          ROUND(CAST(AVG(agg1) AS DOUBLE), 2),
          ROUND(CAST(AVG(agg2) AS DOUBLE), 2),
          ROUND(CAST(AVG(agg3) AS DOUBLE), 2),
          ROUND(CAST(AVG(agg4) AS DOUBLE), 2)
   FROM results GROUP BY i_item_id
   UNION ALL
   SELECT NULL AS i_item_id, NULL AS s_state, 1 AS g_state,
          ROUND(CAST(AVG(agg1) AS DOUBLE), 2),
          ROUND(CAST(AVG(agg2) AS DOUBLE), 2),
          ROUND(CAST(AVG(agg3) AS DOUBLE), 2),
          ROUND(CAST(AVG(agg4) AS DOUBLE), 2)
   FROM results) foo
ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
LIMIT 100
""")

# q28 — six quantity-band aggregate triples cross-joined (28.sql; price/
# coupon/wholesale bands mapped to the fixture's value ranges)
_tpcds("tpcds_q28", """
SELECT *
FROM
  (SELECT ROUND(CAST(AVG(ss_list_price) AS DOUBLE), 2) AS B1_LP,
          COUNT(ss_list_price) AS B1_CNT,
          COUNT(DISTINCT ss_list_price) AS B1_CNTD
   FROM {store_sales} store_sales
   WHERE ss_quantity BETWEEN 0 AND 5
     AND (ss_list_price BETWEEN 8 AND 18
          OR ss_coupon_amt BETWEEN 10 AND 20
          OR ss_wholesale_cost BETWEEN 57 AND 77)) B1,
  (SELECT ROUND(CAST(AVG(ss_list_price) AS DOUBLE), 2) AS B2_LP,
          COUNT(ss_list_price) AS B2_CNT,
          COUNT(DISTINCT ss_list_price) AS B2_CNTD
   FROM {store_sales} store_sales
   WHERE ss_quantity BETWEEN 6 AND 10
     AND (ss_list_price BETWEEN 80 AND 90
          OR ss_coupon_amt BETWEEN 12 AND 22
          OR ss_wholesale_cost BETWEEN 31 AND 51)) B2,
  (SELECT ROUND(CAST(AVG(ss_list_price) AS DOUBLE), 2) AS B3_LP,
          COUNT(ss_list_price) AS B3_CNT,
          COUNT(DISTINCT ss_list_price) AS B3_CNTD
   FROM {store_sales} store_sales
   WHERE ss_quantity BETWEEN 11 AND 15
     AND (ss_list_price BETWEEN 70 AND 80
          OR ss_coupon_amt BETWEEN 5 AND 15
          OR ss_wholesale_cost BETWEEN 79 AND 90)) B3,
  (SELECT ROUND(CAST(AVG(ss_list_price) AS DOUBLE), 2) AS B4_LP,
          COUNT(ss_list_price) AS B4_CNT,
          COUNT(DISTINCT ss_list_price) AS B4_CNTD
   FROM {store_sales} store_sales
   WHERE ss_quantity BETWEEN 16 AND 20
     AND (ss_list_price BETWEEN 65 AND 75
          OR ss_coupon_amt BETWEEN 6 AND 16
          OR ss_wholesale_cost BETWEEN 38 AND 58)) B4,
  (SELECT ROUND(CAST(AVG(ss_list_price) AS DOUBLE), 2) AS B5_LP,
          COUNT(ss_list_price) AS B5_CNT,
          COUNT(DISTINCT ss_list_price) AS B5_CNTD
   FROM {store_sales} store_sales
   WHERE ss_quantity BETWEEN 21 AND 25
     AND (ss_list_price BETWEEN 60 AND 70
          OR ss_coupon_amt BETWEEN 8 AND 18
          OR ss_wholesale_cost BETWEEN 17 AND 37)) B5,
  (SELECT ROUND(CAST(AVG(ss_list_price) AS DOUBLE), 2) AS B6_LP,
          COUNT(ss_list_price) AS B6_CNT,
          COUNT(DISTINCT ss_list_price) AS B6_CNTD
   FROM {store_sales} store_sales
   WHERE ss_quantity BETWEEN 26 AND 30
     AND (ss_list_price BETWEEN 55 AND 65
          OR ss_coupon_amt BETWEEN 9 AND 19
          OR ss_wholesale_cost BETWEEN 7 AND 27)) B6
LIMIT 100
""")

# q36 — gross-margin hierarchy levels + rank within parent (36.sql;
# UNION-spelled rollup, window on top)
_tpcds("tpcds_q36", """
WITH results AS
  (SELECT CAST(SUM(ss_net_profit) AS DOUBLE) AS ss_net_profit,
          CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS ss_ext_sales_price,
          CAST(SUM(ss_net_profit) AS DOUBLE) /
              CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS gross_margin,
          i_category, i_class, 0 AS g_category, 0 AS g_class
   FROM {store_sales} store_sales, {date_dim} d1, {item} item, {store} store
   WHERE d1.d_year = 2001
     AND d1.d_date_sk = ss_sold_date_sk
     AND i_item_sk = ss_item_sk
     AND s_store_sk = ss_store_sk
     AND s_state = 'TN'
   GROUP BY i_category, i_class),
results_rollup AS
  (SELECT gross_margin, i_category, i_class, 0 AS t_category, 0 AS t_class,
          0 AS lochierarchy
   FROM results
   UNION
   SELECT SUM(ss_net_profit) / SUM(ss_ext_sales_price) AS gross_margin,
          i_category, NULL AS i_class, 0 AS t_category, 1 AS t_class,
          1 AS lochierarchy
   FROM results GROUP BY i_category
   UNION
   SELECT SUM(ss_net_profit) / SUM(ss_ext_sales_price) AS gross_margin,
          NULL AS i_category, NULL AS i_class, 1 AS t_category, 1 AS t_class,
          2 AS lochierarchy
   FROM results)
SELECT ROUND(CAST(gross_margin AS DOUBLE), 4) + 0.0 AS gross_margin,
       i_category, i_class, lochierarchy,
       RANK() OVER (PARTITION BY lochierarchy,
                    CASE WHEN t_class = 0 THEN i_category END
                    ORDER BY gross_margin ASC) AS rank_within_parent
FROM results_rollup
ORDER BY lochierarchy DESC NULLS FIRST,
         CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
         rank_within_parent NULLS FIRST, i_category NULLS FIRST,
         i_class NULLS FIRST
LIMIT 100
""")

# q41 — correlated count over item attribute combinations (41.sql;
# manufact band and color/units/size constants mapped to fixture cycles)
_tpcds("tpcds_q41", """
SELECT DISTINCT (i_product_name) AS i_product_name
FROM {item} i1
WHERE i_manufact_id BETWEEN 100 AND 140
  AND (SELECT COUNT(*) AS item_cnt
       FROM {item} item
       WHERE (item.i_manufact = i1.i_manufact
              AND ((item.i_category = 'category#1'
                    AND (item.i_color = 'powder' OR item.i_color = 'khaki')
                    AND (item.i_units = 'Ounce' OR item.i_units = 'Oz')
                    AND (item.i_size = 'medium' OR item.i_size = 'extra large'))
                   OR (item.i_category = 'category#1'
                       AND (item.i_color = 'brown' OR item.i_color = 'honeydew')
                       AND (item.i_units = 'Bunch' OR item.i_units = 'Ton')
                       AND (item.i_size = 'N/A' OR item.i_size = 'small'))
                   OR (item.i_category = 'category#2'
                       AND (item.i_color = 'floral' OR item.i_color = 'deep')
                       AND (item.i_units = 'N/A' OR item.i_units = 'Dozen')
                       AND (item.i_size = 'petite' OR item.i_size = 'large'))
                   OR (item.i_category = 'category#2'
                       AND (item.i_color = 'light' OR item.i_color = 'cornflower')
                       AND (item.i_units = 'Box' OR item.i_units = 'Pound')
                       AND (item.i_size = 'medium' OR item.i_size = 'extra large'))))
          OR (item.i_manufact = i1.i_manufact
              AND ((item.i_category = 'category#1'
                    AND (item.i_color = 'midnight' OR item.i_color = 'snow')
                    AND (item.i_units = 'Pallet' OR item.i_units = 'Gross')
                    AND (item.i_size = 'medium' OR item.i_size = 'extra large'))
                   OR (item.i_category = 'category#1'
                       AND (item.i_color = 'cyan' OR item.i_color = 'papaya')
                       AND (item.i_units = 'Cup' OR item.i_units = 'Dram')
                       AND (item.i_size = 'N/A' OR item.i_size = 'small'))
                   OR (item.i_category = 'category#2'
                       AND (item.i_color = 'orange' OR item.i_color = 'frosted')
                       AND (item.i_units = 'Each' OR item.i_units = 'Tbl')
                       AND (item.i_size = 'petite' OR item.i_size = 'large'))
                   OR (item.i_category = 'category#2'
                       AND (item.i_color = 'forest' OR item.i_color = 'ghost')
                       AND (item.i_units = 'Lb' OR item.i_units = 'Bundle')
                       AND (item.i_size = 'medium' OR item.i_size = 'extra large'))))) > 0
ORDER BY i_product_name
LIMIT 100
""")

# q43 — day-of-week pivot per store (43.sql)
_tpcds("tpcds_q43", """
SELECT s_store_name, s_store_id,
       ROUND(CAST(SUM(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price
                           ELSE NULL END) AS DOUBLE), 2) AS sun_sales,
       ROUND(CAST(SUM(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price
                           ELSE NULL END) AS DOUBLE), 2) AS mon_sales,
       ROUND(CAST(SUM(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price
                           ELSE NULL END) AS DOUBLE), 2) AS tue_sales,
       ROUND(CAST(SUM(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price
                           ELSE NULL END) AS DOUBLE), 2) AS wed_sales,
       ROUND(CAST(SUM(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price
                           ELSE NULL END) AS DOUBLE), 2) AS thu_sales,
       ROUND(CAST(SUM(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price
                           ELSE NULL END) AS DOUBLE), 2) AS fri_sales,
       ROUND(CAST(SUM(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price
                           ELSE NULL END) AS DOUBLE), 2) AS sat_sales
FROM {date_dim} date_dim, {store_sales} store_sales, {store} store
WHERE d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_gmt_offset = -5
  AND d_year = 2000
GROUP BY s_store_name, s_store_id
ORDER BY s_store_name, s_store_id, sun_sales, mon_sales, tue_sales,
         wed_sales, thu_sales, fri_sales, sat_sales
LIMIT 100
""")

# q50 — return-lag day buckets per store (50.sql; the fixture's fixed
# 45-day return lag lands rows in the 31-60 bucket by construction)
_tpcds("tpcds_q50", """
SELECT s_store_name, s_company_id, s_street_number, s_street_name,
       s_street_type, s_suite_number, s_city, s_county, s_state, s_zip,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk <= 30)
                THEN 1 ELSE 0 END) AS d30,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 30)
                AND (sr_returned_date_sk - ss_sold_date_sk <= 60)
                THEN 1 ELSE 0 END) AS d31_60,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 60)
                AND (sr_returned_date_sk - ss_sold_date_sk <= 90)
                THEN 1 ELSE 0 END) AS d61_90,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 90)
                AND (sr_returned_date_sk - ss_sold_date_sk <= 120)
                THEN 1 ELSE 0 END) AS d91_120,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 120)
                THEN 1 ELSE 0 END) AS d_over_120
FROM {store_sales} store_sales, {store_returns} store_returns,
     {store} store, {date_dim} d1, {date_dim} d2
WHERE d2.d_year = 2001
  AND d2.d_moy = 8
  AND ss_ticket_number = sr_ticket_number
  AND ss_item_sk = sr_item_sk
  AND ss_sold_date_sk = d1.d_date_sk
  AND sr_returned_date_sk = d2.d_date_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_store_sk = s_store_sk
GROUP BY s_store_name, s_company_id, s_street_number, s_street_name,
         s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
ORDER BY s_store_name, s_company_id, s_street_number, s_street_name,
         s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
LIMIT 100
""")

# q52 — brand revenue for one manager-month (52.sql)
_tpcds("tpcds_q52", """
SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
       ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS ext_price
FROM {date_dim} dt, {store_sales} store_sales, {item} item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11
  AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
ORDER BY dt.d_year, ext_price DESC, brand_id
LIMIT 100
""")

# q53 — quarterly manufacturer sales vs windowed average (53.sql;
# category/class/brand lists mapped to fixture cycles)
_tpcds("tpcds_q53", """
SELECT i_manufact_id, sum_sales, avg_quarterly_sales
FROM
  (SELECT i_manufact_id,
          ROUND(CAST(SUM(ss_sales_price) AS DOUBLE), 2) AS sum_sales,
          ROUND(CAST(AVG(SUM(ss_sales_price)) OVER (
              PARTITION BY i_manufact_id) AS DOUBLE), 2)
              AS avg_quarterly_sales
   FROM {item} item, {store_sales} store_sales, {date_dim} date_dim,
        {store} store
   WHERE ss_item_sk = i_item_sk
     AND ss_sold_date_sk = d_date_sk
     AND ss_store_sk = s_store_sk
     AND d_month_seq IN (1200, 1201, 1202, 1203, 1204, 1205, 1206, 1207,
                         1208, 1209, 1210, 1211)
     AND ((i_category IN ('category#1', 'category#2', 'category#3')
           AND i_class IN ('class#1', 'class#2', 'class#3', 'class#4'))
          OR (i_category IN ('category#4', 'category#5', 'category#6')
              AND i_class IN ('class#5', 'class#6', 'class#7', 'class#8')))
   GROUP BY i_manufact_id, d_qoy) tmp1
WHERE CASE WHEN avg_quarterly_sales > 0
           THEN ABS(sum_sales - avg_quarterly_sales) / avg_quarterly_sales
           ELSE NULL END > 0.1
ORDER BY avg_quarterly_sales, sum_sales, i_manufact_id
LIMIT 100
""")

# q63 — monthly manager sales vs windowed average (63.sql)
_tpcds("tpcds_q63", """
SELECT i_manager_id, sum_sales, avg_monthly_sales
FROM
  (SELECT i_manager_id,
          ROUND(CAST(SUM(ss_sales_price) AS DOUBLE), 2) AS sum_sales,
          ROUND(CAST(AVG(SUM(ss_sales_price)) OVER (
              PARTITION BY i_manager_id) AS DOUBLE), 2) AS avg_monthly_sales
   FROM {item} item, {store_sales} store_sales, {date_dim} date_dim,
        {store} store
   WHERE ss_item_sk = i_item_sk
     AND ss_sold_date_sk = d_date_sk
     AND ss_store_sk = s_store_sk
     AND d_month_seq IN (1200, 1201, 1202, 1203, 1204, 1205, 1206, 1207,
                         1208, 1209, 1210, 1211)
     AND ((i_category IN ('category#1', 'category#2', 'category#3')
           AND i_class IN ('class#1', 'class#2', 'class#3', 'class#4'))
          OR (i_category IN ('category#4', 'category#5', 'category#6')
              AND i_class IN ('class#5', 'class#6', 'class#7', 'class#8')))
   GROUP BY i_manager_id, d_moy) tmp1
WHERE CASE WHEN avg_monthly_sales > 0
           THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
           ELSE NULL END > 0.1
ORDER BY i_manager_id, avg_monthly_sales, sum_sales
LIMIT 100
""")

# q65 — under-performing item/store revenue vs 10% of store average
# (65.sql)
_tpcds("tpcds_q65", """
SELECT s_store_name, i_item_desc, sc.revenue, i_current_price,
       i_wholesale_cost, i_brand
FROM {store} store, {item} item,
  (SELECT ss_store_sk, ROUND(CAST(AVG(revenue) AS DOUBLE), 2) AS ave
   FROM
     (SELECT ss_store_sk, ss_item_sk,
             ROUND(CAST(SUM(ss_sales_price) AS DOUBLE), 2) AS revenue
      FROM {store_sales} store_sales, {date_dim} date_dim
      WHERE ss_sold_date_sk = d_date_sk
        AND d_month_seq BETWEEN 1176 AND 1187
      GROUP BY ss_store_sk, ss_item_sk) sa
   GROUP BY ss_store_sk) sb,
  (SELECT ss_store_sk, ss_item_sk,
          ROUND(CAST(SUM(ss_sales_price) AS DOUBLE), 2) AS revenue
   FROM {store_sales} store_sales, {date_dim} date_dim
   WHERE ss_sold_date_sk = d_date_sk
     AND d_month_seq BETWEEN 1176 AND 1187
   GROUP BY ss_store_sk, ss_item_sk) sc
WHERE sb.ss_store_sk = sc.ss_store_sk
  -- reference threshold is 0.1; the fixture's uniform price cycle never
  -- dips below ~15% of the store average, so 0.5 keeps the band-join
  -- shape AND a non-empty differential
  AND sc.revenue <= 0.5 * sb.ave
  AND s_store_sk = sc.ss_store_sk
  AND i_item_sk = sc.ss_item_sk
ORDER BY s_store_name NULLS FIRST, i_item_desc NULLS FIRST,
         sc.revenue NULLS FIRST, i_brand NULLS FIRST
LIMIT 100
""")

# q93 — actual sales net of returns for one return reason (93.sql)
_tpcds("tpcds_q93", """
SELECT ss_customer_sk, ROUND(CAST(SUM(act_sales) AS DOUBLE), 2) AS sumsales
FROM
  (SELECT ss_item_sk, ss_ticket_number, ss_customer_sk,
          CASE WHEN sr_return_quantity IS NOT NULL
               THEN (ss_quantity - sr_return_quantity) * ss_sales_price
               ELSE (ss_quantity * ss_sales_price) END AS act_sales
   FROM {store_sales} store_sales
   LEFT OUTER JOIN {store_returns} store_returns
     ON (sr_item_sk = ss_item_sk AND sr_ticket_number = ss_ticket_number),
   {reason} reason
   WHERE sr_reason_sk = r_reason_sk
     AND r_reason_desc = 'reason 28') t
GROUP BY ss_customer_sk
ORDER BY sumsales NULLS FIRST, ss_customer_sk NULLS FIRST
LIMIT 100
""")

# q98 — item revenue with class-partitioned ratio window (98.sql)
_tpcds("tpcds_q98", """
SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
       ROUND(CAST(SUM(ss_ext_sales_price) AS DOUBLE), 2) AS itemrevenue,
       ROUND(CAST(SUM(ss_ext_sales_price) * 100.0000 /
             SUM(SUM(ss_ext_sales_price)) OVER (PARTITION BY i_class)
             AS DOUBLE), 4) AS revenueratio
FROM {store_sales} store_sales, {item} item, {date_dim} date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('category#4', 'category#5', 'category#6')
  AND ss_sold_date_sk = d_date_sk
  AND d_date BETWEEN CAST('1999-02-22' AS DATE) AND CAST('1999-03-24' AS DATE)
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category NULLS FIRST, i_class NULLS FIRST,
         i_item_id NULLS FIRST, i_item_desc NULLS FIRST,
         revenueratio NULLS FIRST
""")
