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
# ROUND-12 ROTATION (VERDICT r10 item 8: rotate EVERY round; any query
# whose implementation changed in-round MUST lead the next window):
# the 8 queries whose bodies the optimization round rewrote (q21 window
# aggregates, text tokenization staging, minhash verify stage,
# sessionization sum-of-flags) lead; the other 42 slots take the
# registered queries with the OLDEST green driver rows — the 9 last-green
# r05 (cb top-k/regex slice) and 33 of the r06 cohort. Computed from
# CORRECTNESS_r01..r11; pre-verified by the driver-faithful
# scripts/check_contract.py (canonical-rendering compare, no tolerance).
PRIORITY: list[str] = [
    # r12-rewritten — post-rewrite driver evidence must lead the window
    "tpch_q21", "text_quality", "text_langid", "text_profile",
    "text_token_stats", "dedup_minhash_lsh", "ev_timeseries",
    "ev_sessionization",
    # last green row r05 (oldest remaining evidence)
    "cb_q16", "cb_q18", "cb_q20", "cb_q21", "cb_q23", "cb_q25", "cb_q28",
    "cb_q32", "cb_q40",
    # last green row r06
    "cb_q10", "cb_q11", "cb_q13", "cb_q14", "cb_q15", "cb_q17", "cb_q19",
    "cb_q22", "cb_q24", "cb_q26", "cb_q27", "cb_q29", "cb_q30", "cb_q31",
    "cb_q33", "cb_q34", "cb_q35", "cb_q36", "cb_q37", "cb_q38", "cb_q39",
    "cb_q41", "cb_q42",
    "dedup_exact", "dedup_minhash_sig", "dedup_simhash", "sim_lsh_topk",
    "sketch_lttb", "stream_windowed_counts",
    "tpcds_q06", "tpcds_q13", "tpcds_q17", "tpcds_q27",
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
