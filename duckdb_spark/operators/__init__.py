from duckdb_spark.operators.asof import asof_join, asof_self_join
from duckdb_spark.operators.fill import fill_interpolate
from duckdb_spark.operators.misc import distinct_on, positional_join, reservoir_sample
from duckdb_spark.operators.recursive import recursive_cte

__all__ = [
    "asof_join",
    "asof_self_join",
    "fill_interpolate",
    "recursive_cte",
    "distinct_on",
    "positional_join",
    "reservoir_sample",
]
