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
from pyspark.sql import functions as F

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
    default; explicit options override the sniffer.

    Defaults diverge from Spark's: RFC4180 `""` quote-doubling (DuckDB's
    escape default, reference csv_reader_options.cpp) and multiLine for
    quoted embedded newlines (test_thread_count.test's bigram CSV). Note
    multiLine disables intra-file split parallelism — at 100-TB scale
    pass `multiline=False` (or convert to parquet) for splittable scans;
    DuckDB's boundary-detecting parallel CSV scanner has no Spark
    equivalent."""
    spark_opts: dict[str, str] = {"header": "true", "inferSchema": "true",
                                  "escape": '"', "multiLine": "true"}
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
        if isinstance(names, dict):
            # columns={'v': 'UUID[]'}: the declared types BIND — nested
            # types parse through the textcast runtime so malformed text
            # errors like the reference's child cast
            # (cast/string_to_list_cast.test:503)
            from pyspark.sql import functions as F
            from pyspark.sql import types as T

            from duckdb_spark.sql.textcast import (
                RUNTIME_CASTS,
                runtime_cast_fn,
                runtime_cast_name,
            )
            from duckdb_spark.types import duckdb_type_to_spark

            sel = []
            for cn, dty in names.items():
                st = duckdb_type_to_spark(dty)
                if isinstance(st, (T.ArrayType, T.StructType, T.MapType)) \
                        and isinstance(df.schema[cn].dataType, T.StringType):
                    fn = runtime_cast_name(dty, False)
                    spark.udf.register(
                        fn, runtime_cast_fn(*RUNTIME_CASTS[fn]), st)
                    sel.append(F.expr(f"{fn}(`{cn}`)").alias(cn))
                else:
                    sel.append(F.col(cn).cast(st).alias(cn))
            df = df.select(*sel)
    return df


def _sniff_type(values: list[str]) -> str:
    """Type-detection phase of the sniffer (reference csv_sniffer.hpp
    phase 3/4: type detection + refinement over the sample): try the type
    ladder BOOLEAN → BIGINT → DOUBLE → DATE → TIMESTAMP → VARCHAR on every
    sampled value."""
    import re as _re

    vals = [v for v in values if v not in ("", None)]
    if not vals:
        return "VARCHAR"
    if all(v.lower() in ("true", "false") for v in vals):
        return "BOOLEAN"
    if all(_re.fullmatch(r"[+-]?\d+", v) for v in vals):
        return "BIGINT"
    if all(_re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", v) for v in vals):
        return "DOUBLE"
    if all(_re.fullmatch(r"\d{4}-\d{2}-\d{2}", v) for v in vals):
        return "DATE"
    if all(_re.fullmatch(r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?", v) for v in vals):
        return "TIMESTAMP"
    return "VARCHAR"


def sniff_csv(path: str, sample_bytes: int = 64 * 1024) -> dict:
    """Mirror of DuckDB's `sniff_csv()` table function — full output-column
    set (`src/function/table/sniff_csv.cpp`): Delimiter, Quote, Escape,
    NewLineDelimiter, SkipRows, HasHeader, Columns (with sniffed types),
    DateFormat, TimestampFormat, UserArguments, Prompt. Driver-side (reads
    one file head) — sniffing is inherently a small-sample operation in
    the reference too."""
    files = sorted(_glob.glob(path)) or [path]
    with open(files[0], "rb") as fh:
        raw = fh.read(sample_bytes)
    newline = "\r\n" if b"\r\n" in raw else "\n"
    sample = raw.decode("utf-8", errors="replace")
    # skip-rows detection: leading lines that don't match the dominant
    # column count (phase 1 of the reference sniffer searches dialect +
    # skip jointly; a consistency scan approximates it on clean data)
    try:
        dialect = _csv.Sniffer().sniff(sample, delimiters=",;|\t")
        has_header = _csv.Sniffer().has_header(sample)
    except _csv.Error:
        dialect, has_header = None, True
    delim = dialect.delimiter if dialect else ","
    quote = dialect.quotechar if dialect else '"'
    rows = list(_csv.reader(_io.StringIO(sample), delimiter=delim, quotechar=quote))
    if not rows:
        return {"Delimiter": delim, "Quote": quote, "Escape": quote,
                "NewLineDelimiter": newline, "SkipRows": 0, "HasHeader": False,
                "Columns": [], "DateFormat": None, "TimestampFormat": None,
                "UserArguments": None, "Prompt": None}
    from collections import Counter

    ncols = Counter(len(r) for r in rows).most_common(1)[0][0]
    skip = 0
    while skip < len(rows) - 1 and len(rows[skip]) != ncols:
        skip += 1
    body = rows[skip:]
    header_row = body[0] if body else []
    data = body[1:] if has_header else body
    names = (
        header_row if has_header else [f"column{i:02d}" for i in range(ncols)]
    )
    cols = []
    for i in range(ncols):
        sampled = [r[i] for r in data[:100] if len(r) > i]
        cols.append({"name": names[i] if i < len(names) else f"column{i:02d}",
                     "type": _sniff_type(sampled)})
    date_fmt = "%Y-%m-%d" if any(c["type"] == "DATE" for c in cols) else None
    ts_fmt = (
        "%Y-%m-%d %H:%M:%S" if any(c["type"] == "TIMESTAMP" for c in cols) else None
    )
    col_spec = ", ".join(f"'{c['name']}': '{c['type']}'" for c in cols)
    prompt = (
        f"FROM read_csv('{files[0]}', auto_detect=false, delim='{delim}', "
        f"quote='{quote}', escape='{quote}', new_line='{newline}', skip={skip}, "
        f"header={str(bool(has_header)).lower()}, columns={{{col_spec}}});"
    )
    return {
        "Delimiter": delim,
        "Quote": quote,
        "Escape": quote,
        "NewLineDelimiter": newline,
        "SkipRows": skip,
        "HasHeader": bool(has_header),
        "Columns": cols,
        "DateFormat": date_fmt,
        "TimestampFormat": ts_fmt,
        "UserArguments": None,
        "Prompt": prompt,
    }


def read_csv_with_rejects(
    spark: SparkSession, path: str, schema: str, **options
):
    """CSV scan with a rejects table (reference
    src/execution/operator/persistent/csv_rejects_table.cpp: the
    store_rejects/rejects_table options collect unparseable lines instead
    of failing the scan). Spark-side: PERMISSIVE mode with a corrupt-record
    column; returns (clean_df, rejects_df) where rejects carries the
    DuckDB rejects-table shape (file, line content as csv_line, error)."""
    corrupt = "__rejects"
    reader = (
        spark.read.options(
            header=str(options.pop("header", True)).lower(),
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=corrupt,
        )
        .schema(schema + f", {corrupt} STRING")
    )
    for k, v in options.items():
        mapped = _CSV_OPTION_MAP.get(k, k)
        if mapped:
            reader = reader.option(mapped, str(v) if not isinstance(v, bool) else str(v).lower())
    from pyspark.sql import functions as F

    # capture the file name BEFORE caching (input_file_name() has no file
    # context once rows come from the cache); one scan serves both outputs
    df = reader.csv(path).withColumn("__file", F.input_file_name()).cache()
    clean = df.filter(F.col(corrupt).isNull()).drop(corrupt, "__file")
    rejects = df.filter(F.col(corrupt).isNotNull()).select(
        F.col("__file").alias("file"),
        F.col(corrupt).alias("csv_line"),
        F.lit("CAST: could not parse line against schema").alias("error"),
    )
    return clean, rejects


def read_parquet(spark: SparkSession, path: str | list[str],
                 file_row_number: bool = False,
                 union_by_name: bool = False, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if union_by_name:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*path) if isinstance(path, list) else reader.parquet(path)
    if file_row_number:
        df = df.selectExpr("*", "_metadata.row_index AS file_row_number")
    return df


def read_json(spark: SparkSession, path: str, format: str = "auto", **options) -> DataFrame:
    reader = spark.read.options(**options)
    if format in ("array", "auto"):
        # DuckDB auto-detects top-level-array JSON; Spark needs multiLine.
        reader = reader.option("multiLine", "true") if format == "array" else reader
    return reader.json(path)  # Spark accepts str or list here natively


def read_duckdb(spark: SparkSession, db_path: str, table: str) -> DataFrame:
    """Read a table out of a .duckdb database file (reference
    src/function/table/read_duckdb.cpp / ATTACH): open read-only through
    the duckdb client, stream Arrow batches, hand to Spark. The file is a
    single-machine artifact, so the driver-side read is inherent —
    downstream transformations are distributed as usual."""
    import duckdb

    con = duckdb.connect(db_path, read_only=True)
    try:
        arrow_table = con.execute(f'SELECT * FROM "{table}"').arrow()
    finally:
        con.close()
    return spark.createDataFrame(arrow_table.to_pandas())


def read_blob(spark: SparkSession, path: str) -> DataFrame:
    """DuckDB read_blob(pattern) → (filename, content BLOB, size, last_modified)
    via Spark's binaryFile source (reference src/function/table/read_file.cpp
    schema). Distributed: each file is a task-side read, glob/dir patterns
    fan out across executors; content column is pruned when unused."""
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.col("path").alias("filename"),
        F.col("content"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("last_modified"),
    )


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """DuckDB read_text(pattern): read_blob with UTF-8 decoded content.
    decode() is JVM-side; invalid UTF-8 raises, matching the reference's
    "could not be decoded" error path."""
    blob = read_blob(spark, path)
    return blob.withColumn("content", F.decode(F.col("content"), "UTF-8"))


def read_file(spark: SparkSession, path: str) -> DataFrame:
    """Alias surface: reference registers read_text/read_blob from
    read_file.cpp; read_file behaves as read_blob."""
    return read_blob(spark, path)


def csv_for_copy_from(spark, path: str, opts: str, target_names,
                      target_ducktypes=None):
    """CSV source for COPY <table> FROM: DuckDB auto-detects the header
    row (reference read_csv auto_detect). Emulate: read headerless, and
    promote the first row to a header when it matches the target column
    names OR fails a DuckDB TRY_CAST probe against the target types
    (cast/string_to_list_cast.test writes one file with the default
    expression-name header and one with HEADER 0)."""
    import re as _re

    dm = _re.search(
        r"(?i)\b(?:DELIMITER|DELIM|SEP|SEPARATOR)\s+'((?:[^']|'')*)'", opts)
    sep = dm.group(1).replace("''", "'") if dm else ","
    # DuckDB unescapes \t/\n/\r in COPY delimiter options (pg_lateral.test
    # reads tenk.tsv.gz with DELIMITER '\t')
    sep = sep.replace("\\t", "\t").replace("\\n", "\n").replace("\\r", "\r")
    rd = spark.read.option("sep", sep)
    hm = _re.search(r"(?i)\bHEADER\s+'?(\w+)'?", opts)
    if hm:
        hdr = hm.group(1).lower() in ("1", "true", "on")
        return rd.option("header", str(hdr).lower()).csv(path)
    df = rd.option("header", "false").csv(path)
    first = df.limit(1).collect()
    is_header = False
    if first:
        tl = [str(t).lower() for t in target_names]
        vals = list(first[0])
        if [str(v).lower() for v in vals] == tl[:len(vals)]:
            is_header = True
        elif target_ducktypes:
            try:
                import duckdb as _dk

                con = _dk.connect()
                for v, dt in zip(vals, target_ducktypes):
                    if v is None or _re.match(r"(?i)^\s*(varchar|string|"
                                              r"text)", dt):
                        continue
                    probe = con.execute(
                        f"SELECT TRY_CAST(? AS {dt})", [str(v)]
                    ).fetchone()[0]
                    if probe is None:
                        is_header = True
                        break
                con.close()
            except Exception:  # noqa: BLE001 — keep headerless reading
                pass
    if is_header:
        return rd.option("header", "true").csv(path)
    return df
