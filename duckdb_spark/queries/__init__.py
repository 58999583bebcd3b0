"""Query catalog: every implemented operator exposed as (spark, sf_dir) →
DataFrame, with a DuckDB-oracle SQL string for the driver's correctness gate.

Modules register into QUERIES / ORACLE; __spark_entry__.py re-exports them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query builder (and optionally its oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver's correctness gate hard-checks the FIRST 50 registered queries.
# ROUND-5 ROTATION: round 4's driver run crashed before checking anything
# (VERDICT r04), so no query has an r04 row. The window therefore takes
# every query that has NEVER had a driver row — the full 19-query TPC-DS
# slice and the full 20-query ClickBench slice (both landed after the r03
# window was pinned) — plus the 10 queries whose only green row is r01,
# and tpch_q01 as the cross-round sentinel. Every other registered query
# keeps its r02/r03 green row and is re-verified every session by
# tests/test_queries.py, which runs the identical differential at sf0.001.
PRIORITY: list[str] = [
    # never driver-checked: the TPC-DS slice (19)
    "tpcds_q01", "tpcds_q03", "tpcds_q07", "tpcds_q15", "tpcds_q19",
    "tpcds_q25", "tpcds_q26", "tpcds_q29", "tpcds_q34", "tpcds_q42",
    "tpcds_q48", "tpcds_q55", "tpcds_q61", "tpcds_q68", "tpcds_q73",
    "tpcds_q79", "tpcds_q88", "tpcds_q89", "tpcds_q96",
    # never driver-checked: the ClickBench slice (20)
    "cb_q00", "cb_q01", "cb_q02", "cb_q03", "cb_q04", "cb_q05", "cb_q06",
    "cb_q07", "cb_q08", "cb_q09", "cb_q12", "cb_q16", "cb_q18", "cb_q20",
    "cb_q21", "cb_q23", "cb_q25", "cb_q28", "cb_q32", "cb_q40",
    # r01-green-only (10)
    "agg_grouping_sets", "agg_rollup", "agg_cube", "agg_filter_distinct",
    "agg_stats", "ev_sessionization", "ev_time_bucket", "ev_fill_gaps",
    "ev_range_join", "text_langid",
    # cross-round sentinel (1)
    "tpch_q01",
]


def load_all() -> None:
    """Import every query module (side effect: registration), then reorder
    the registry so PRIORITY queries occupy the driver's check window."""
    from duckdb_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        clickbench,
        dedup,
        dml_queries,
        functions_parity,
        similarity,
        streaming_queries,
        text,
        tpcds,
        tpch,
        tpch2,
        windows,
    )

    # Past the window: the r02-green suites first (regression signal lives
    # in tests/test_queries.py between driver rounds), then the r01-green
    # narrows whose coverage the merged window queries carry.
    secondary = [
        *[f"tpch_q{i:02d}" for i in range(1, 23)],
        "win_ranking", "win_offsets", "win_frames", "win_topk_per_group",
        "win_qualify", "agg_grouping", "agg_distributive", "agg_stats_wide",
        "agg_collect_list", "dedup_exact", "dedup_minhash_sig", "dedup_simhash",
        "dedup_ngram_jaccard", "dedup_embedding_cosine", "sim_lsh_topk",
        "sim_label_centroids", "text_token_stats", "text_profile",
        "stream_windowed_counts", "stream_session_windows", "ev_range_join_all",
        "ev_timeseries", "fn_list_batch", "sample_bernoulli", "dml_batch",
        "agg_grouping_sets", "agg_rollup", "agg_cube", "agg_filter_distinct",
        "agg_stats", "ev_sessionization", "ev_time_bucket", "ev_fill_gaps",
        "ev_range_join", "text_langid",
    ]
    # A PRIORITY typo must never zero out a driver round (VERDICT r04): an
    # unregistered name is dropped with a warning, not raised — the driver
    # still checks every real query in the window.
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        import warnings

        warnings.warn(
            f"PRIORITY names not registered (dropped from window): {missing}",
            stacklevel=2,
        )
    head = [n for n in PRIORITY if n in QUERIES] + [
        n for n in secondary if n in QUERIES
    ]
    ordered = head + [n for n in QUERIES if n not in head]
    for d in (QUERIES, ORACLE):
        items = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(items)
