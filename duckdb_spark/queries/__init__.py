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
# ROUND-7 ROTATION (VERDICT r06 item 1d): 50 of the 65 round-6 TPC-DS
# queries that have NEVER had a driver CORRECTNESS row, leading with the
# three that shipped broken in r06 — tpcds_q02 (unparseable SQL, fixed),
# tpcds_q65 / tpcds_q98 (driver hash fails from unpinned double rounding,
# now pinned through the AVGR DECIMAL(20,6) pattern). The 15 remaining
# never-checked queries (q69..q99 tail) rotate in next round; every other
# registered query keeps its prior green row and is re-verified every
# session by tests/test_queries.py (identical differential at sf0.001).
PRIORITY: list[str] = [
    # broken in r06, fixed this round — must lead the window
    "tpcds_q02", "tpcds_q65", "tpcds_q98",
    # never driver-checked round-6 TPC-DS expansion (47 of the 64 others)
    "tpcds_q04", "tpcds_q05", "tpcds_q08", "tpcds_q09", "tpcds_q10",
    "tpcds_q11", "tpcds_q12", "tpcds_q14", "tpcds_q16", "tpcds_q18",
    "tpcds_q20", "tpcds_q21", "tpcds_q22", "tpcds_q23", "tpcds_q24",
    "tpcds_q30", "tpcds_q31", "tpcds_q32", "tpcds_q33", "tpcds_q35",
    "tpcds_q37", "tpcds_q38", "tpcds_q39", "tpcds_q40", "tpcds_q44",
    "tpcds_q45", "tpcds_q46", "tpcds_q47", "tpcds_q49", "tpcds_q51",
    "tpcds_q54", "tpcds_q56", "tpcds_q57", "tpcds_q58", "tpcds_q59",
    "tpcds_q60", "tpcds_q62", "tpcds_q64", "tpcds_q66", "tpcds_q67",
    "tpcds_q69", "tpcds_q70", "tpcds_q71", "tpcds_q72", "tpcds_q74",
    "tpcds_q75", "tpcds_q76",
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
