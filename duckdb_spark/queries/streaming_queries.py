"""Streaming queries — Structured Streaming pipelines driven to completion.

The windowed aggregation is the SAME expression tree as a batch 6h tumbling
window, so its oracle is plain SQL on epoch-aligned buckets (Spark's
`window()` aligns tumbling windows to the Unix epoch). This differentially
validates the full streaming path: file source → microbatch → watermark →
windowed state → memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_spark.queries import register
from duckdb_spark.streaming import run_batch_as_stream, sessionized_stream, windowed_counts


@register(
    "stream_windowed_counts",
    oracle="""
SELECT (epoch_us(ts) // CAST(21600000000 AS BIGINT)) * CAST(21600000000 AS BIGINT) AS w_start_us,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM events
GROUP BY w_start_us, event_type
ORDER BY w_start_us, event_type
""",
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6h tumbling-window counts computed BY A REAL STREAMING QUERY
    (readStream → withWatermark → window agg → memory sink), compared to
    the batch SQL oracle."""
    out = run_batch_as_stream(
        spark,
        f"{sf_dir}/events.parquet",
        lambda s: windowed_counts(s, window="6 hours", watermark="1 hour"),
        query_name="stream_windowed_counts_out",
    )
    return out.orderBy("w_start_us", "event_type")


@register(
    "stream_session_windows",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t FROM events),
lagged AS (
  SELECT user_id, t,
         CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) >= 1800 * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM e),
sess AS (
  SELECT user_id, t,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagged)
SELECT user_id, MIN(t) AS s_start_us, MAX(t) + 1800 * 1000000 AS s_end_us,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start_us
""",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30min) streaming pipeline vs the batch-SQL session
    formulation as oracle (Spark session semantics: a new session starts
    when the gap is >= the threshold; session end = last event + gap)."""
    out = run_batch_as_stream(
        spark,
        f"{sf_dir}/events.parquet",
        lambda s: sessionized_stream(s, gap="30 minutes", watermark="1 hour"),
        query_name="stream_session_windows_out",
    )
    return out.orderBy("user_id", "s_start_us")
