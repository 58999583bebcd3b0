"""Dynamic PIVOT — value discovery then pivot (SURVEY.md §2.2).

Reference: `physical_pivot.cpp` + `bind_pivot.cpp` — DuckDB's dynamic
PIVOT runs a preliminary DISTINCT aggregate to enumerate the pivot
values at bind time, then plans the pivot with that explicit list. We do
exactly that: one small distinct-collect (bounded by `max_values`),
then Spark's single-pass pivot with the explicit value list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dynamic_pivot(
    df: DataFrame,
    group_by: list[str],
    pivot_col: str,
    agg,
    max_values: int = 10000,
) -> DataFrame:
    """PIVOT with discovered values: `agg` is a Column aggregate (e.g.
    F.count('*') / F.sum('x')). Values are collected sorted so the output
    column order is deterministic."""
    values = [
        r[0]
        for r in df.select(pivot_col).distinct().orderBy(pivot_col).limit(max_values + 1).collect()
    ]
    if len(values) > max_values:
        raise ValueError(
            f"dynamic_pivot: >{max_values} distinct values in {pivot_col}; "
            "pass an explicit list or raise max_values"
        )
    return df.groupBy(*group_by).pivot(pivot_col, values).agg(agg)


def unpivot(
    df: DataFrame,
    ids: list[str],
    value_cols: list[str],
    var_name: str = "name",
    value_name: str = "value",
) -> DataFrame:
    """UNPIVOT/melt (reference bind_pivot.cpp UNPIVOT path → native melt)."""
    return df.unpivot(ids, value_cols, var_name, value_name)
