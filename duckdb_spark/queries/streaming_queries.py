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


@register("stream_session_windows")
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30min) streaming pipeline (rows-only check: the
    batch equivalent ev_sessionization pins per-user session *counts*; this
    exercises the streaming session-state operator itself)."""
    out = run_batch_as_stream(
        spark,
        f"{sf_dir}/events.parquet",
        lambda s: sessionized_stream(s, gap="30 minutes", watermark="1 hour"),
        query_name="stream_session_windows_out",
    )
    return out.orderBy("user_id", "s_start_us")
