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
# ROUND-10 ROTATION (VERDICT r09 item 2: rotate EVERY round; any query
# whose implementation changed in-round MUST lead the next window): the 4
# queries materially rewritten in r09 (tpch_q21 one-shuffle window rewrite,
# tpcds_q25 broadcast restructuring, ev_timeseries shared-window + digest,
# dedup_minhash_lsh single-md5-pass pipeline) lead so the driver artifact
# finally carries post-rewrite evidence, followed by the 46 registered
# queries with the OLDEST green driver rows (30 last-green r02 + 16
# last-green r03, computed from CORRECTNESS_r01..r09). All 50 pre-verified
# by the driver-faithful scripts/check_contract.py (canonical-rendering
# compare, no float tolerance).
PRIORITY: list[str] = [
    # r09-rewritten — post-rewrite driver evidence must lead the window
    "tpch_q21", "tpcds_q25", "ev_timeseries", "dedup_minhash_lsh",
    # oldest driver evidence: last green row r02
    "agg_collect_list", "agg_distributive", "agg_grouping", "agg_stats_wide",
    "dml_batch", "ev_range_join_all", "fn_list_batch", "sample_bernoulli",
    "stream_session_windows", "text_profile",
    "tpch_q03", "tpch_q04", "tpch_q06", "tpch_q07", "tpch_q08", "tpch_q09",
    "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q16", "tpch_q17", "tpch_q19", "tpch_q20", "tpch_q22",
    "win_offsets", "win_qualify", "win_ranking",
    # last green row r03
    "agg_bool_bit", "agg_entropy", "agg_product", "agg_skew_kurtosis",
    "agg_string_agg", "ev_distinct_on", "fn_conditional_batch",
    "fn_date_batch", "fn_math_batch", "fn_string_batch",
    "fn_struct_map_batch", "fn_wave2_agg", "fn_wave2_scalar",
    "text_length_histogram", "tpch_q05", "tpch_q18",
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
