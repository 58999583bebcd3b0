"""Multi-pass statistical operators that can't be a single aggregate Column.

MAD (median absolute deviation, reference
extension/core_functions/aggregate/holistic/mad.cpp) needs the group median
before the deviations can be aggregated — in a streaming engine that's one
holistic state; on Spark it's two hash aggregations over the same grouping
key (both partial-combined, same shuffle key so the second agg reuses the
partitioning established by the join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_by_group(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_col: str = "mad"
) -> DataFrame:
    """Per-group median absolute deviation: median(|x - median(x)|).

    Two passes: (1) per-group median, (2) join back (broadcast — one row
    per group) and aggregate the absolute deviations. At scale the join is
    a broadcast of the tiny medians table, so only the two groupBys shuffle
    and both use the same key."""
    gcols = list(group_cols)
    med = df.groupBy(*gcols).agg(F.percentile(value_col, F.lit(0.5)).alias("__med"))
    return (
        df.join(F.broadcast(med), gcols)
        .groupBy(*gcols)
        .agg(
            F.percentile(F.abs(F.col(value_col) - F.col("__med")), F.lit(0.5)).alias(
                out_col
            )
        )
    )


def mad_global(df: DataFrame, value_col: str, out_col: str = "mad") -> DataFrame:
    """Ungrouped MAD (single output row)."""
    med = df.agg(F.percentile(value_col, F.lit(0.5)).alias("__med"))
    return (
        df.crossJoin(F.broadcast(med))
        .agg(
            F.percentile(F.abs(F.col(value_col) - F.col("__med")), F.lit(0.5)).alias(
                out_col
            )
        )
    )
