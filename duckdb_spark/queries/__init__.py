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
# ROUND-4 ROTATION (VERDICT.md r03 "Next round" #2): the 11 never-driver-
# checked queries are the 10 tpcds_q* (registered after the r03 window was
# pinned) and sketch_lttb (no_oracle by design — rows-only row recorded in
# r03; excluded here so a hard-checkable query keeps the slot). Window =
# 10 TPC-DS + the 10 queries whose only green row is r01 (so every
# registered query has a green row inside the r02–r04 range) + 3 r03-green
# sentinels + 10 ClickBench queries NEW this round (in-window the round
# they land, unlike the r03 TPC-DS slice) + 17 r02-only re-confirmations.
# The 20 r02-only queries left outside keep their r02 green row; their
# shapes are carried in-window by tpch_q03/q09/q21, win_topk_per_group/
# win_frames, agg_grouping/agg_stats_wide, ev_timeseries.
PRIORITY: list[str] = [
    # never driver-checked: the TPC-DS slice (10)
    "tpcds_q01", "tpcds_q03", "tpcds_q07", "tpcds_q19", "tpcds_q25",
    "tpcds_q26", "tpcds_q29", "tpcds_q42", "tpcds_q55", "tpcds_q96",
    # r01-green-only (10)
    "agg_grouping_sets", "agg_rollup", "agg_cube", "agg_filter_distinct",
    "agg_stats", "ev_sessionization", "ev_time_bucket", "ev_fill_gaps",
    "ev_range_join", "text_langid",
    # r03-green sentinels (3)
    "tpch_q01", "dedup_minhash_lsh", "ev_asof_join",
    # new this round: ClickBench slice (10)
    "cb_q01", "cb_q08", "cb_q12", "cb_q16", "cb_q18",
    "cb_q21", "cb_q23", "cb_q28", "cb_q32", "cb_q40",
    # r02-only re-confirmations (17)
    "tpch_q03", "tpch_q04", "tpch_q06", "tpch_q07", "tpch_q08", "tpch_q09",
    "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q17", "tpch_q21", "tpch_q22",
    "win_topk_per_group", "win_frames", "ev_timeseries",
    "agg_grouping", "agg_stats_wide",
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
