"""File readers with DuckDB-flavored option names.

Reference surface:
- `read_csv` / `read_csv_auto` with the 5-phase dialect sniffer
  (`src/function/table/read_csv.cpp`, `src/execution/operator/csv_scanner/
  sniffer/csv_sniffer.hpp:74-84`) → `spark.read.csv` with inferSchema plus a
  light Python-side dialect sniffer (`sniff_csv`) mirroring
  `src/function/table/sniff_csv.cpp`'s output columns.
- `read_parquet` (`extension/parquet/parquet_reader.cpp`): row-group pruning,
  bloom filters and column pruning are native to Spark's vectorized parquet
  source; `file_row_number` maps to the `_metadata.row_index` hidden column.
- `read_json` / `read_json_auto` (`extension/json/json_functions/
  read_json.cpp`) → `spark.read.json` (NDJSON default, `multiLine` for
  array-of-objects files).

All readers return lazy DataFrames — scans stay distributed, schema
inference samples, and pushdown applies (check `.explain` → PushedFilters).
"""

from __future__ import annotations

import csv as _csv
import glob as _glob
import io as _io

from pyspark.sql import DataFrame, SparkSession

# DuckDB read_csv option name → Spark DataFrameReader option name.
_CSV_OPTION_MAP = {
    "delim": "sep",
    "sep": "sep",
    "quote": "quote",
    "escape": "escape",
    "header": "header",
    "skip": "skipRows",
    "comment": "comment",
    "nullstr": "nullValue",
    "null_padding": None,  # Spark pads missing trailing columns natively
    "dateformat": "dateFormat",
    "timestampformat": "timestampFormat",
    "compression": "compression",
    "ignore_errors": None,  # → mode=DROPMALFORMED
    "encoding": "encoding",
    "sample_size": "samplingRatio",
    "all_varchar": None,  # → inferSchema=False
    "names": None,
    "columns": None,
}


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    """DuckDB `read_csv_auto` semantics: sniff dialect + infer types by
    default; explicit options override the sniffer."""
    spark_opts: dict[str, str] = {"header": "true", "inferSchema": "true"}
    schema = options.pop("schema", None)
    names = options.pop("names", None) or options.pop("columns", None)
    if options.pop("all_varchar", False):
        spark_opts["inferSchema"] = "false"
    if options.pop("ignore_errors", False):
        spark_opts["mode"] = "DROPMALFORMED"
    for k, v in options.items():
        mapped = _CSV_OPTION_MAP.get(k, k)
        if mapped:
            spark_opts[mapped] = str(v) if not isinstance(v, bool) else str(v).lower()
    reader = spark.read.options(**spark_opts)
    if schema is not None:
        reader = reader.schema(schema)
        reader = reader.option("inferSchema", "false")
    df = reader.csv(path)
    if names:
        df = df.toDF(*names)
    return df


def sniff_csv(path: str, sample_bytes: int = 64 * 1024) -> dict:
    """Mirror of DuckDB's `sniff_csv()` table function output
    (`src/function/table/sniff_csv.cpp`): detect delimiter/quote/header
    from a sample. Driver-side (reads one file head) — fine, sniffing is
    inherently a small-sample operation in the reference too."""
    files = sorted(_glob.glob(path)) or [path]
    with open(files[0], "rb") as fh:
        sample = fh.read(sample_bytes).decode("utf-8", errors="replace")
    try:
        dialect = _csv.Sniffer().sniff(sample, delimiters=",;|\t")
        has_header = _csv.Sniffer().has_header(sample)
    except _csv.Error:
        dialect, has_header = None, True
    delim = dialect.delimiter if dialect else ","
    quote = dialect.quotechar if dialect else '"'
    reader = _csv.reader(_io.StringIO(sample), delimiter=delim, quotechar=quote)
    first = next(reader, [])
    return {
        "Delimiter": delim,
        "Quote": quote,
        "Escape": quote,
        "HasHeader": bool(has_header),
        "Columns": [{"name": c if has_header else f"column{i:02d}", "type": "VARCHAR"}
                    for i, c in enumerate(first)],
    }


def read_parquet(spark: SparkSession, path: str, file_row_number: bool = False,
                 union_by_name: bool = False, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if union_by_name:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    if file_row_number:
        df = df.selectExpr("*", "_metadata.row_index AS file_row_number")
    return df


def read_json(spark: SparkSession, path: str, format: str = "auto", **options) -> DataFrame:
    reader = spark.read.options(**options)
    if format in ("array", "auto"):
        # DuckDB auto-detects top-level-array JSON; Spark needs multiLine.
        reader = reader.option("multiLine", "true") if format == "array" else reader
    return reader.json(path)
