"""System / introspection table functions (SURVEY.md §2.1 last row).

Reference: `src/function/table/system/` (43 table functions). Re-exposed
over the Spark session catalog: each returns a DataFrame with the
reference's column names so existing DuckDB introspection queries keep
working against our engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_spark.functions.registry import FUNCTIONS
from duckdb_spark.types import spark_type_to_duckdb


def duckdb_tables(spark: SparkSession) -> DataFrame:
    """duckdb_tables() — one row per table/view in the session catalog."""
    rows = [
        (
            "memory",            # database_name (in-process semantics)
            "main",              # schema_name
            t.name,
            t.tableType == "TEMPORARY",
            t.isTemporary,
            len(spark.table(t.name).columns),
        )
        for t in spark.catalog.listTables()
    ]
    return spark.createDataFrame(
        rows,
        "database_name string, schema_name string, table_name string, "
        "temporary boolean, is_temporary boolean, column_count int",
    )


def duckdb_columns(spark: SparkSession) -> DataFrame:
    """duckdb_columns() — one row per column of every catalog table."""
    rows = []
    for t in spark.catalog.listTables():
        for i, f in enumerate(spark.table(t.name).schema.fields):
            rows.append(
                (
                    "memory", "main", t.name, f.name, i,
                    spark_type_to_duckdb(f.dataType), f.nullable,
                )
            )
    return spark.createDataFrame(
        rows,
        "database_name string, schema_name string, table_name string, "
        "column_name string, column_index int, data_type string, is_nullable boolean",
    )


def duckdb_functions(spark: SparkSession) -> DataFrame:
    """duckdb_functions() — the engine's DuckDB-name function registry
    plus every Spark SQL builtin reachable from SQL text. return_type is
    populated for the overload families the corpus introspects
    (reservoir_quantile / approx_quantile: one row per signature, with and
    without the sample/count argument — reference
    src/core_functions/aggregate/holistic/reservoir_quantile.cpp)."""
    rows = [
        (name, "scalar", "duckdb_spark.functions", None)
        for name in sorted(FUNCTIONS)
        if name not in ("reservoir_quantile", "approx_quantile")
    ]
    _Q_TYPES = ["TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                "FLOAT", "DOUBLE", "DECIMAL"]
    for fname in ("reservoir_quantile", "approx_quantile"):
        for t in _Q_TYPES:
            # scalar quantile: (T, DOUBLE) and (T, DOUBLE, INTEGER)
            rows.append((fname, "aggregate", "duckdb_spark.functions", t))
            rows.append((fname, "aggregate", "duckdb_spark.functions", t))
            # list quantile: (T, DOUBLE[]) and (T, DOUBLE[], INTEGER)
            rows.append(
                (fname, "aggregate", "duckdb_spark.functions", f"{t}[]"))
            rows.append(
                (fname, "aggregate", "duckdb_spark.functions", f"{t}[]"))
    rows += [
        (f.name, "builtin", "spark", None)
        for f in spark.catalog.listFunctions()
        if not f.name.startswith("_")
    ]
    return spark.createDataFrame(
        rows,
        "function_name string, function_type string, origin string, "
        "return_type string",
    )


def duckdb_types(spark: SparkSession) -> DataFrame:
    """duckdb_types() — the engine's type registry (reference
    src/function/table/system/duckdb_types.cpp). Every mapped DuckDB
    type name reports as a system type."""
    from duckdb_spark.types import _SIMPLE

    rows = [
        ("system", "main", name, name, "NUMERIC" if "INT" in name
         or name in ("FLOAT", "DOUBLE", "DECIMAL", "NUMERIC", "REAL")
         else "STRING" if name in ("VARCHAR", "TEXT", "STRING", "CHAR")
         else "DATETIME" if "TIME" in name or name == "DATE"
         else "BOOLEAN" if name in ("BOOLEAN", "BOOL", "LOGICAL")
         else "COMPOSITE", True)
        for name in sorted(_SIMPLE)
    ]
    return spark.createDataFrame(
        rows,
        "database_name string, schema_name string, type_name string, "
        "logical_type string, type_category string, internal boolean",
    )


def duckdb_memory(spark: SparkSession) -> DataFrame:
    """duckdb_memory() — memory-usage breakdown by tag (reference
    src/function/table/system/duckdb_memory.cpp). Spark's JVM owns
    allocation; every DuckDB tag reports zero from this engine."""
    tags = [
        "BASE_TABLE", "HASH_TABLE", "PARQUET_READER", "CSV_READER",
        "ORDER_BY", "ART_INDEX", "COLUMN_DATA", "METADATA",
        "OVERFLOW_STRINGS", "IN_MEMORY_TABLE", "ALLOCATOR", "EXTENSION",
    ]
    return spark.createDataFrame(
        [(t, 0, 0) for t in tags],
        "tag string, memory_usage_bytes bigint, temporary_storage_bytes bigint",
    )


def pragma_table_info(spark: SparkSession, table: str) -> DataFrame:
    """pragma_table_info('t') — SQLite-compatible table description
    (reference src/function/table/sqlite/pragma_table_info.cpp)."""
    rows = [
        (i, f.name, spark_type_to_duckdb(f.dataType), not f.nullable, None, False)
        for i, f in enumerate(spark.table(table).schema.fields)
    ]
    return spark.createDataFrame(
        rows,
        "cid int, name string, type string, notnull boolean, "
        "dflt_value string, pk boolean",
    )


def duckdb_settings(spark: SparkSession) -> DataFrame:
    """duckdb_settings() — the session's SQL conf (name/value/description)."""
    items = spark.sql("SET -v").collect()
    return spark.createDataFrame(
        [(r["key"], r["value"], r["meaning"]) for r in items],
        "name string, value string, description string",
    )


def duckdb_views(spark: SparkSession) -> DataFrame:
    rows = [
        ("memory", "main", t.name)
        for t in spark.catalog.listTables()
        if t.tableType in ("TEMPORARY", "VIEW") or t.isTemporary
    ]
    return spark.createDataFrame(rows, "database_name string, schema_name string, view_name string")
