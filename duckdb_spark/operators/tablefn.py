"""Misc table functions: repeat, repeat_row, query, query_table.

Reference: src/function/table/repeat.cpp, repeat_row.cpp,
query_function.cpp (semantics studied, not ported).

All generators build on spark.range(), which distributes row production
across the cluster (numSlices follows default parallelism) — no
driver-side row materialization regardless of count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def repeat(spark: SparkSession, value, count: int) -> DataFrame:
    """repeat(value, count): `count` rows of the constant `value`; the
    column is named after the value's string form (repeat.cpp:25
    `names.emplace_back(inputs[0].ToString())`)."""
    if count < 0:
        raise ValueError("repeat: count must be non-negative")  # repeat.cpp:31
    name = "NULL" if value is None else str(value)
    return spark.range(count).select(F.lit(value).alias(name))


def repeat_row(spark: SparkSession, *values, num_rows: int | None = None) -> DataFrame:
    """repeat_row(v0, v1, ..., num_rows=N): N identical rows, columns named
    column0.. (repeat_row.cpp:26)."""
    if num_rows is None:
        raise ValueError("repeat_rows requires num_rows to be specified")  # :30
    if not values:
        raise ValueError(
            "repeat_rows requires at least one column to be specified"  # :33
        )
    cols = [F.lit(v).alias(f"column{i}") for i, v in enumerate(values)]
    return spark.range(num_rows).select(*cols)


def query(spark: SparkSession, sql_text: str) -> DataFrame:
    """query('SELECT ...'): run a single SELECT given as a string
    (query_function.cpp:83). Routed through the dialect layer so DuckDB
    SQL constructs work in the text."""
    from duckdb_spark.sql.dialect import translate

    stripped = sql_text.strip().rstrip(";").strip()
    if not stripped.lower().startswith(("select", "with", "values", "from")):
        raise ValueError("Expected a single SELECT statement")  # :71
    return spark.sql(translate(stripped))


def query_table(spark: SparkSession, name, by_name: bool = False) -> DataFrame:
    """query_table('t') → the table/view contents; query_table(['a','b'])
    unions the tables — positionally by default, by name with
    by_name=True (query_function.cpp:87-95)."""
    if isinstance(name, str):
        return spark.table(name)
    dfs = [spark.table(n) for n in name]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df) if by_name else out.union(df)
    return out
