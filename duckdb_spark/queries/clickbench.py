"""ClickBench workload slice (reference `benchmark/clickbench/`): the 10
query shapes PRIORITY names — selective count (q01), count-distinct top-k
(q08), string-filtered group-by top-k (q12/q16/q18/q21), full-row top-k
scan (q23), regex-domain rollup with HAVING (q28), wide two-key group-by
(q32), and a multi-predicate slice with LIMIT/OFFSET pagination (q40).

One SQL text per query runs through BOTH engines — Spark via the dialect
layer (`sql.dialect.translate` → Catalyst), DuckDB via read_parquet
substitution — so each is also an arbitrary-SQL-entry proof.

Reference query text: `benchmark/clickbench/queries/qNN.sql` (adapted:
aggregates aliased, non-integer aggregates rounded+cast to DOUBLE, and
deterministic tie-breaker columns appended to every ORDER BY so the
driver's value-hash compare is stable; HAVING/filter constants scaled to
the fixture's row count). `cb_qNN` here = reference `qNN.benchmark`.

Fixture: the real ClickBench `hits` table is a 100M-row web-analytics log
distributed as a ~75 GB parquet download; like the TPC-DS slice, a
deterministic arithmetic fixture is generated on demand into /tmp — pure
hash/modulus arithmetic over `range()`, no RNG, so both engines and every
rerun see byte-identical data. Schema is the 19-column slice of
`benchmark/clickbench/queries/load.sql` that the 10 queries actually
reference (q23's SELECT * resolves against the same parquet schema in
both engines). Value cycles are chosen so every predicate slice is
non-trivially selective: AdvEngineID!=0 on ~6%, SearchPhrase non-empty on
30% (25 hot phrases + 475-long tail), URL contains 'google' on 1/11, and
the q40 conjunction (CounterID=62 ∧ July-2013 ∧ IsRefresh=0 ∧
TraficSourceID∈(-1,6) ∧ RefererHash=…) keeps ~5k rows over >110 groups so
LIMIT 10 OFFSET 100 is meaningful.

Scale posture: every query is a single scan + one hash aggregate (or
top-k sort) over the fact table — no joins. At 100 TB the aggregates are
partial-agg + single shuffle on the group keys; the top-k ORDER BY/LIMIT
plans collapse to TakeOrderedAndProject (no global sort materialization);
q23's SELECT * top-k carries all columns but only 10 rows past the scan.
The high-cardinality group-bys (q16/q32: UserID×phrase, WatchID×IP) are
the shuffle-heavy ones — AQE sizes their post-shuffle partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from duckdb_spark.queries import register

CB_DIR = os.environ.get("SPARK_GRAFT_CLICKBENCH_DIR", "/tmp/duckdb_spark_clickbench")

_N = 200_000  # ~sf0.002 of the real 100M-row hits table

_GEN_SQL = f"""
CREATE OR REPLACE TABLE hits AS
SELECT
    (i * 37) % 50000 AS WatchID,
    (i % 2)::SMALLINT AS JavaEnable,
    'title ' || (i % 1000) AS Title,
    TIMESTAMP '2013-07-01 00:00:00' + INTERVAL ((i * 97) % 2678400) SECOND
        AS EventTime,
    DATE '2013-07-01' + INTERVAL (((i * 97) % 2678400) // 86400) DAY
        AS EventDate,
    (CASE WHEN i % 4 = 0 THEN 62 ELSE 1 + (i * 7) % 100 END)::INTEGER
        AS CounterID,
    ((i * 2654435761) % 1000000)::INTEGER AS ClientIP,
    (CASE WHEN i % 2 = 0 THEN i % 5 ELSE (i * 31) % 150 END)::INTEGER
        AS RegionID,
    (i * 123457) % 8000 AS UserID,
    (i % 30)::SMALLINT AS OS,
    CASE WHEN i % 10 < 7 THEN ''
         WHEN i % 10 = 7 THEN 'phrase ' || (i % 25)
         ELSE 'phrase ' || (25 + (i * 17) % 475) END AS SearchPhrase,
    (CASE WHEN i % 17 = 0 THEN 1 + i % 5 ELSE 0 END)::SMALLINT AS AdvEngineID,
    'http://' ||
        CASE WHEN i % 11 = 0 THEN 'google.com/' ELSE 'example' || (i % 50) || '.com/' END
        || 'path' || ((i * 13) % 1000) AS URL,
    CASE WHEN i % 5 = 0 THEN ''
         ELSE 'https://' || CASE WHEN i % 3 = 0 THEN 'www.' ELSE '' END
              || 'site' || (i % 30) || '.org/ref/' || (i % 500) END AS Referer,
    (CASE WHEN i % 7 = 0 THEN 1 ELSE 0 END)::SMALLINT AS IsRefresh,
    ([-1, 0, 1, 6, 3, 2, 8, -1, 6, 5][1 + i % 10])::SMALLINT AS TraficSourceID,
    CASE WHEN i % 3 = 0 THEN 3594120000172545465
         ELSE (i * 104729) * 1000003 END AS RefererHash,
    (i * 2654435761) % 2000 AS URLHash,
    (1000 + (i % 25) * 40)::SMALLINT AS ResolutionWidth
FROM range({_N}) t(i);
"""


def ensure_fixture(out_dir: str = CB_DIR) -> str:
    """Generate the hits fixture if missing (deterministic; idempotent)."""
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return out_dir
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(_GEN_SQL)
    con.execute(f"COPY hits TO '{out_dir}/hits.parquet' (FORMAT PARQUET)")
    con.close()
    open(marker, "w").write("ok\n")
    return out_dir


def _spark_run(spark: SparkSession, sql: str) -> DataFrame:
    from duckdb_spark.sql.dialect import translate

    ensure_fixture()
    spark.read.parquet(f"{CB_DIR}/hits.parquet").createOrReplaceTempView("hits")
    return spark.sql(translate(sql.format(hits="hits")))


def _cb(name: str, sql: str):
    @register(name, oracle=sql.format(hits=f"read_parquet('{CB_DIR}/hits.parquet')"))
    def q(spark: SparkSession, sf_dir: str, _sql=sql) -> DataFrame:  # noqa: ARG001
        """ClickBench over the deterministic fixture (sf_dir unused: hits
        has its own schema; reference benchmark/clickbench/queries)."""
        ensure_fixture()
        return _spark_run(spark, _sql)

    q.__name__ = name
    return q


# q01 — selective count (queries/q01.sql)
_cb("cb_q01", """
SELECT COUNT(*) AS cnt FROM {hits} hits WHERE AdvEngineID <> 0
""")

# q08 — count-distinct top-k by region (q08.sql)
_cb("cb_q08", """
SELECT RegionID, COUNT(DISTINCT UserID) AS u
FROM {hits} hits GROUP BY RegionID ORDER BY u DESC, RegionID LIMIT 10
""")

# q12 — phrase frequency top-k (q12.sql)
_cb("cb_q12", """
SELECT SearchPhrase, COUNT(*) AS c
FROM {hits} hits WHERE SearchPhrase <> ''
GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10
""")

# q16 — high-cardinality two-key group-by top-k (q16.sql)
_cb("cb_q16", """
SELECT UserID, SearchPhrase, COUNT(*) AS c
FROM {hits} hits GROUP BY UserID, SearchPhrase
ORDER BY c DESC, UserID, SearchPhrase LIMIT 10
""")

# q18 — group-by over an extracted time part (q18.sql)
_cb("cb_q18", """
SELECT UserID, CAST(extract(minute FROM EventTime) AS INTEGER) AS m,
       SearchPhrase, COUNT(*) AS c
FROM {hits} hits GROUP BY UserID, m, SearchPhrase
ORDER BY c DESC, UserID, m, SearchPhrase LIMIT 10
""")

# q21 — LIKE filter + min/count rollup (q21.sql)
_cb("cb_q21", """
SELECT SearchPhrase, MIN(URL) AS min_url, COUNT(*) AS c
FROM {hits} hits WHERE URL LIKE '%google%' AND SearchPhrase <> ''
GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10
""")

# q23 — full-row top-k scan (q23.sql)
_cb("cb_q23", """
SELECT * FROM {hits} hits WHERE URL LIKE '%google%'
ORDER BY EventTime, WatchID, URL LIMIT 10
""")

# q28 — regex domain extraction + HAVING rollup (q28.sql; the reference
# uses REGEXP_REPLACE with a backreference — regexp_extract of the same
# capture group is engine-portable and avoids backslash-literal dialect
# drift; HAVING 100000 scaled to fixture size)
_cb("cb_q28", """
SELECT regexp_extract(Referer, 'https?://(?:www[.])?([^/]+)', 1) AS k,
       ROUND(CAST(AVG(LENGTH(Referer)) AS DOUBLE), 2) AS l,
       COUNT(*) AS c, MIN(Referer) AS min_referer
FROM {hits} hits WHERE Referer <> ''
GROUP BY k HAVING COUNT(*) > 2000 ORDER BY l DESC, k LIMIT 25
""")

# q32 — wide two-key group-by with mixed aggregates (q32.sql)
_cb("cb_q32", """
SELECT WatchID, ClientIP, COUNT(*) AS c,
       CAST(SUM(IsRefresh) AS BIGINT) AS sum_refresh,
       ROUND(CAST(AVG(ResolutionWidth) AS DOUBLE), 2) AS avg_width
FROM {hits} hits GROUP BY WatchID, ClientIP
ORDER BY c DESC, WatchID, ClientIP LIMIT 10
""")

# q40 — multi-predicate slice + LIMIT/OFFSET pagination (q40.sql)
_cb("cb_q40", """
SELECT URLHash, EventDate, COUNT(*) AS PageViews
FROM {hits} hits
WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
  AND IsRefresh = 0 AND TraficSourceID IN (-1, 6)
  AND RefererHash = 3594120000172545465
GROUP BY URLHash, EventDate
ORDER BY PageViews DESC, URLHash, EventDate LIMIT 10 OFFSET 100
""")


# ---- round-5 expansion: 10 more queries over the same fixture columns ----

# q00 — bare count (queries/q00.sql)
_cb("cb_q00", """
SELECT COUNT(*) AS cnt FROM {hits} hits
""")

# q02 — scan-wide aggregate triple (q02.sql)
_cb("cb_q02", """
SELECT CAST(SUM(AdvEngineID) AS BIGINT) AS sum_adv, COUNT(*) AS cnt,
       ROUND(CAST(AVG(ResolutionWidth) AS DOUBLE), 2) AS avg_width
FROM {hits} hits
""")

# q03 — single avg (q03.sql)
_cb("cb_q03", """
SELECT ROUND(CAST(AVG(UserID) AS DOUBLE), 2) AS avg_user FROM {hits} hits
""")

# q04 — count distinct users (q04.sql)
_cb("cb_q04", """
SELECT COUNT(DISTINCT UserID) AS u FROM {hits} hits
""")

# q05 — count distinct phrases (q05.sql)
_cb("cb_q05", """
SELECT COUNT(DISTINCT SearchPhrase) AS p FROM {hits} hits
""")

# q06 — date range (q06.sql)
_cb("cb_q06", """
SELECT MIN(EventDate) AS min_date, MAX(EventDate) AS max_date FROM {hits} hits
""")

# q07 — ad-engine frequency (q07.sql)
_cb("cb_q07", """
SELECT AdvEngineID, COUNT(*) AS c FROM {hits} hits
WHERE AdvEngineID <> 0 GROUP BY AdvEngineID ORDER BY c DESC, AdvEngineID
""")

# q09 — region rollup with four aggregate kinds (q09.sql)
_cb("cb_q09", """
SELECT RegionID, CAST(SUM(AdvEngineID) AS BIGINT) AS sum_adv, COUNT(*) AS c,
       ROUND(CAST(AVG(ResolutionWidth) AS DOUBLE), 2) AS avg_width,
       COUNT(DISTINCT UserID) AS u
FROM {hits} hits GROUP BY RegionID ORDER BY c DESC, RegionID LIMIT 10
""")

# q20 — LIKE-filtered count (q20.sql)
_cb("cb_q20", """
SELECT COUNT(*) AS cnt FROM {hits} hits WHERE URL LIKE '%google%'
""")

# q25 — phrase scan ordered by time (q25.sql)
_cb("cb_q25", """
SELECT SearchPhrase FROM {hits} hits WHERE SearchPhrase <> ''
ORDER BY EventTime, SearchPhrase LIMIT 10
""")
