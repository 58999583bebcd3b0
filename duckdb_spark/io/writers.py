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
        writer.option("header", str(header).lower()).csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported COPY TO format: {format}")
