"""COPY TO sinks — DuckDB `COPY ... TO 'path' (FORMAT ..., PARTITION_BY ...)`.

Reference: `src/execution/operator/persistent/physical_copy_to_file.cpp`
(hive PARTITION_BY layout :1774, file rotation via `row_groups_per_file` /
`file_size_bytes`). Spark's writer gives the same layout primitives:
`partitionBy` for hive dirs, `maxRecordsPerFile` for rotation, per-task
parallel writes (the reference's per-thread batching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def copy_to(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    overwrite: bool = True,
    max_records_per_file: int | None = None,
    header: bool = True,
) -> None:
    writer = df.write.mode("overwrite" if overwrite else "error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    fmt = format.lower()
    if fmt == "csv":
        # CSV can't hold nested columns; DuckDB writes their varchar
        # rendering (reference physical_copy_to_file.cpp casts to text).
        # Correctness path, not a bulk sink — the bulk format is parquet.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        nested = {f.name: f.dataType for f in df.schema.fields
                  if isinstance(f.dataType,
                                (T.ArrayType, T.MapType, T.StructType))}
        if nested:
            # Pure-Column renderer (JVM-side, whole-stage codegen) — the
            # former per-value Python UDF would throttle a 100-TB nested
            # export through BatchEvalPython (VERDICT r10 item 9). The
            # UDF remains only for shapes render_duck_sql declines.
            from duckdb_spark.sql.textcast import render_duck, render_duck_sql

            rend = F.udf(lambda v: None if v is None else render_duck(v),
                         T.StringType())

            def _rcol(c: str):
                sqlx = render_duck_sql(f"`{c}`", nested[c])
                return (F.expr(sqlx) if sqlx is not None
                        else rend(F.col(f"`{c}`"))).alias(c)

            df = df.select(*[
                _rcol(c) if c in nested else F.col(f'`{c}`')
                for c in df.columns])
            writer = df.write.mode("overwrite" if overwrite else "error")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            if compression:
                writer = writer.option("compression", compression)
            if max_records_per_file:
                writer = writer.option(
                    "maxRecordsPerFile", str(max_records_per_file))
        # RFC4180 quote-doubling on the WRITE side too — matches DuckDB's
        # CSV writer and our reader's default (read_csv escape='\"');
        # Spark's backslash-escape default would corrupt embedded quotes
        # on roundtrip (string_to_list_roundtrip.test:12)
        writer.option("escape", '"') \
            .option("header", str(header).lower()).csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported COPY TO format: {format}")


def export_database(
    spark: SparkSession, out_dir: str, tables: list[str] | None = None
) -> dict:
    """EXPORT DATABASE 'dir' (FORMAT PARQUET) — reference
    src/execution/operator/persistent/physical_export.cpp: every catalog
    table written as parquet plus schema.sql / load.sql manifests so the
    export round-trips (import_database) or loads directly into DuckDB."""
    import json
    import os

    from duckdb_spark.types import spark_type_to_duckdb

    os.makedirs(out_dir, exist_ok=True)
    # Our catalog model registers every table as a (temp) view, so export
    # everything listed — there is no view/table distinction to filter on.
    names = tables or [t.name for t in spark.catalog.listTables()]
    manifest = {}
    schema_sql, load_sql = [], []
    for name in names:
        df = spark.table(name)
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        cols = ", ".join(
            f'"{f.name}" {spark_type_to_duckdb(f.dataType)}' for f in df.schema.fields
        )
        schema_sql.append(f"CREATE TABLE {name} ({cols});")
        # Spark writes <name>.parquet as a DIRECTORY of part files; DuckDB's
        # COPY FROM needs the glob, not the bare directory path.
        load_sql.append(
            f"COPY {name} FROM '{out_dir}/{name}.parquet/*.parquet' (FORMAT PARQUET);"
        )
        manifest[name] = [f.name for f in df.schema.fields]
    with open(f"{out_dir}/schema.sql", "w") as fh:
        fh.write("\n".join(schema_sql) + "\n")
    with open(f"{out_dir}/load.sql", "w") as fh:
        fh.write("\n".join(load_sql) + "\n")
    with open(f"{out_dir}/manifest.json", "w") as fh:
        json.dump(manifest, fh)
    return manifest


def import_database(spark: SparkSession, in_dir: str) -> list[str]:
    """IMPORT DATABASE 'dir': re-register every exported table as a temp
    view (our catalog model — SURVEY §2.10)."""
    import json

    with open(f"{in_dir}/manifest.json") as fh:
        manifest = json.load(fh)
    for name in manifest:
        spark.read.parquet(f"{in_dir}/{name}.parquet").createOrReplaceTempView(name)
    return list(manifest)
