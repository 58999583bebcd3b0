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
    plus every Spark SQL builtin reachable from SQL text."""
    rows = [(name, "scalar", "duckdb_spark.functions") for name in sorted(FUNCTIONS)]
    rows += [
        (f.name, "builtin", "spark")
        for f in spark.catalog.listFunctions()
        if not f.name.startswith("_")
    ]
    return spark.createDataFrame(
        rows, "function_name string, function_type string, origin string"
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
