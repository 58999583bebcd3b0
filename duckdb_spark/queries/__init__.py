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


def bench_scale_mult(sf_dir: str) -> int:
    """Scale multiplier for the self-generated benchmark fixtures (TPC-DS /
    ClickBench), derived from the driver's sf dir: the base fixture is sized
    ~sf0.01, so sf0.1 → 10×, sf1 → 100× (fact tables scale linearly, dims
    stay fixed — dsdgen semantics). sf ≤ 0.01 (correctness gates) → 1, so
    the registered oracle strings, which bake the base fixture path, stay
    valid for every differential run."""
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(tail)
    except ValueError:
        return 1
    return max(1, int(round(sf / 0.01)))


def register(name: str, oracle: str | None = None):
    """Decorator: add a query builder (and optionally its oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver's correctness gate hard-checks the FIRST 50 registered queries.
# ROUND-11 ROTATION (VERDICT r10 item 8: rotate EVERY round; any query
# whose implementation changed in-round MUST lead the next window):
# ev_timeseries was rewritten this round (eager checkpoint dropped in
# favor of runtime exchange reuse) so it leads; the other 49 slots take
# the registered queries with the OLDEST green driver rows — all 9 with
# last-green r03 (the window/value suite) and 40 of the 49 with
# last-green r05, leaving nothing older than r05 unrefreshed. Computed
# from CORRECTNESS_r01..r10; pre-verified by the driver-faithful
# scripts/check_contract.py (canonical-rendering compare, no tolerance).
PRIORITY: list[str] = [
    # r11-rewritten — post-rewrite driver evidence must lead the window
    "ev_timeseries",
    # last green row r03 (oldest remaining evidence)
    "val_generate_series", "win_first_last", "win_lag_gap",
    "win_lead_ignorenulls", "win_moving_avg", "win_ntile",
    "win_percent_rank", "win_range_frame", "win_running_total",
    # last green row r05
    "agg_cube", "agg_filter_distinct", "agg_grouping_sets", "agg_rollup",
    "agg_stats", "ev_fill_gaps", "ev_range_join", "ev_sessionization",
    "ev_time_bucket", "text_langid", "tpch_q01",
    "tpcds_q01", "tpcds_q03", "tpcds_q07", "tpcds_q15", "tpcds_q19",
    "tpcds_q26", "tpcds_q29", "tpcds_q34", "tpcds_q42", "tpcds_q48",
    "tpcds_q55", "tpcds_q61", "tpcds_q68", "tpcds_q73", "tpcds_q79",
    "tpcds_q88", "tpcds_q89", "tpcds_q96",
    "cb_q00", "cb_q01", "cb_q02", "cb_q03", "cb_q04", "cb_q05", "cb_q06",
    "cb_q07", "cb_q08", "cb_q09", "cb_q12",
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
