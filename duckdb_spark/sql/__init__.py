from duckdb_spark.sql.dialect import translate
from duckdb_spark.sql.macros import MacroRegistry

__all__ = ["translate", "MacroRegistry"]
