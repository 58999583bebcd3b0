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


def load_all() -> None:
    """Import every query module (side effect: registration)."""
    from duckdb_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        dedup,
        dml_queries,
        functions_parity,
        similarity,
        streaming_queries,
        text,
        tpch,
        tpch2,
        windows,
    )
