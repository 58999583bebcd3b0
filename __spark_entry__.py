"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``duckdb_spark`` package; queries self-register
into ``duckdb_spark.queries.QUERIES`` / ``ORACLE``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_spark import queries as _q  # noqa: E402
from duckdb_spark.session import ENGINE_CONF  # noqa: E402

_q.load_all()


def _ensure_conf(spark: SparkSession) -> SparkSession:
    """Apply engine conf to a driver-provided session (runtime-settable
    subset only; static confs like nanosAsLong must be set at build time —
    if the driver's session lacks them, catalog.py handles the fallback)."""
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep going
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    _ensure_conf(spark)
    return _q.QUERIES["tpch_q01"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        return lambda spark, sf_dir: fn(_ensure_conf(spark), sf_dir)

    return {name: _wrap(fn) for name, fn in _q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLE)
