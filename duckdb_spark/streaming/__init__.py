from duckdb_spark.streaming.pipeline import (
    run_batch_as_stream,
    sessionized_stream,
    windowed_counts,
)

__all__ = ["windowed_counts", "sessionized_stream", "run_batch_as_stream"]
