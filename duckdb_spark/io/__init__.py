from duckdb_spark.io.readers import read_csv, read_json, read_parquet, sniff_csv
from duckdb_spark.io.writers import copy_to

__all__ = ["read_csv", "read_json", "read_parquet", "sniff_csv", "copy_to"]
