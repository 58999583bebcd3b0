"""GROUPS window frames — rewrite Spark lacks (SURVEY.md §2.5 gap).

Reference: WindowBoundary `*_GROUPS` variants
(`src/include/duckdb/parser/expression/window_expression.hpp:18-30`).
A GROUPS frame counts *peer groups* (distinct ORDER BY values), not rows.

Exact rewrite: `dense_rank()` assigns each peer group a consecutive
integer, so `GROUPS BETWEEN n PRECEDING AND m FOLLOWING` over the order
key is precisely `RANGE BETWEEN n PRECEDING AND m FOLLOWING` over the
dense rank. Two window passes, same single shuffle (both windows share
the partition key, Spark reuses the sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def groups_frame(
    df: DataFrame,
    agg: Column,
    partition_by: list[str],
    order_by: list[str],
    preceding: int,
    following: int,
    out_col: str,
) -> DataFrame:
    """Add `out_col` = agg over a GROUPS frame of [preceding, following]
    peer groups around each row's group."""
    w_rank = Window.partitionBy(*partition_by).orderBy(*order_by)
    w_groups = (
        Window.partitionBy(*partition_by)
        .orderBy("__grp")
        .rangeBetween(-preceding, following)
    )
    return (
        df.withColumn("__grp", F.dense_rank().over(w_rank))
        .withColumn(out_col, agg.over(w_groups))
        .drop("__grp")
    )
