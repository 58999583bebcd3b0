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
# ROUND-3 ROTATION (VERDICT.md r02 "Next round" #2): r01+r02 drove 84 of 101
# registered queries; this window packs (a) 6 r02-green sentinels to catch
# regressions in the flagship suites, (b) the 3 queries new this round,
# (c) the 18 queries with NO green driver row yet (17 never in a window +
# fn_struct_map_batch, red in r01 and fixed since), (d) 23 of the 33 queries
# whose only green row is r01. The 10 left outside (grouping-sets/rollup/
# cube/filter-distinct/stats narrows, sessionization/time_bucket/fill/
# range_join narrows, text_langid) keep their r01 green row and their
# coverage is carried by the merged queries inside the window
# (agg_grouping, agg_distributive, agg_stats_wide, ev_timeseries,
# ev_range_join_all, text_profile). Union(r02, r03-window) = 91/101;
# union(r01..r03) = all 101 + the 3 new.
PRIORITY: list[str] = [
    # r02-green sentinels (6)
    "tpch_q01", "tpch_q05", "tpch_q18",
    "dedup_minhash_lsh", "sim_cosine_topk", "ev_asof_join",
    # new this round (3)
    "fn_variant_batch", "tf_read_text", "sketch_topk_merge",
    # never-green (18)
    "fn_wave2_scalar", "fn_wave2_agg", "fn_struct_map_batch",
    "win_running_total", "win_lag_gap", "win_moving_avg", "win_ntile",
    "win_first_last", "win_range_frame", "win_percent_rank",
    "win_lead_ignorenulls", "win_groups_frame",
    "sketch_approx_top_k", "sketch_lttb", "sketch_summarize",
    "text_quality", "text_fingerprint", "text_length_histogram",
    # r01-green-only (23)
    "fn_string_batch", "fn_date_batch", "fn_math_batch", "fn_conditional_batch",
    "ev_json_extract", "ev_pivot", "ev_distinct_on", "ev_set_ops",
    "pivot_dynamic", "unpivot_part", "rec_transitive_closure", "unnest_tokens",
    "val_generate_series", "dml_merge_into", "dml_update_delete",
    "ev_banded_range_join", "agg_skew_kurtosis", "agg_string_agg",
    "agg_quantiles", "agg_argminmax", "agg_product", "agg_entropy",
    "agg_bool_bit",
]


def load_all() -> None:
    """Import every query module (side effect: registration), then reorder
    the registry so PRIORITY queries occupy the driver's check window."""
    from duckdb_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
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
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    head = PRIORITY + [n for n in secondary if n in QUERIES]
    ordered = head + [n for n in QUERIES if n not in head]
    for d in (QUERIES, ORACLE):
        items = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(items)
