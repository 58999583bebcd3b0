"""fill() window function — gap-filling interpolation (SURVEY.md §2.5).

Reference: `FillFun` (`src/function/function_list.cpp:170`,
`src/function/window/window_value_function.cpp`): within a window
partition ordered by a sort key, NULL values are replaced by linear
interpolation between the nearest non-NULL neighbors (extrapolation at the
edges uses the nearest value).

Spark rewrite: two window scans (prev/next non-null value + their order
keys) and a closed-form interpolation expression — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_interpolate(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_by: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    out_col = out_col or value_col + "_filled"
    pb = partition_by or []
    base = Window.partitionBy(*pb).orderBy(F.col(order_col))
    wprev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wnext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    v = F.col(value_col)
    key_if_val = F.when(v.isNotNull(), F.col(order_col))
    prev_v = F.last(v, ignorenulls=True).over(wprev)
    next_v = F.first(v, ignorenulls=True).over(wnext)
    prev_k = F.last(key_if_val, ignorenulls=True).over(wprev)
    next_k = F.first(key_if_val, ignorenulls=True).over(wnext)

    # numeric order key distance (works for numeric + timestamp keys)
    def _num(c):
        return c.cast("double")

    span = _num(next_k) - _num(prev_k)
    frac = F.when(span == 0, F.lit(0.0)).otherwise((_num(F.col(order_col)) - _num(prev_k)) / span)
    interp = prev_v + (next_v - prev_v) * frac

    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)  # leading gap → nearest
        .when(next_v.isNull(), prev_v)  # trailing gap → nearest
        .otherwise(interp)
    )
    return df.withColumn(out_col, filled)
