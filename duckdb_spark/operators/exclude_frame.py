"""EXCLUDE window-frame modifier (reference
src/include/duckdb/parser/expression/window_expression.hpp:18-30:
WindowExcludeMode NO_OTHER / CURRENT_ROW / GROUP / TIES).

Spark has no EXCLUDE syntax; for distributive aggregates (sum/count/avg)
the modifier is exactly expressible by subtraction:

    frame_agg  = agg OVER (frame)
    peer_agg   = agg OVER (ORDER BY k RANGE CURRENT ROW)   -- the peer group
    EXCLUDE CURRENT ROW = frame_agg - current_value
    EXCLUDE GROUP       = frame_agg - peer_agg
    EXCLUDE TIES        = frame_agg - peer_agg + current_value

(avg composes as excluded_sum / excluded_count.) This keeps everything in
one window operator pass — no extra shuffle; the peer aggregate reuses the
same partitioning/sort.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def _peer_window(partition_by: list, order_by: list) -> WindowSpec:
    """RANGE BETWEEN CURRENT ROW AND CURRENT ROW = the ORDER BY peer group."""
    return (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rangeBetween(Window.currentRow, Window.currentRow)
    )


def sum_exclude(
    col: Column,
    frame: WindowSpec,
    partition_by: list,
    order_by: list,
    exclude: str = "current row",
) -> Column:
    """SUM(col) OVER (frame EXCLUDE <mode>) for mode in
    {'current row', 'group', 'ties'} ('no other' is plain sum).
    An empty post-exclusion frame yields NULL (reference semantics), so the
    subtraction is guarded by the excluded count."""
    total = F.sum(col).over(frame)
    mode = exclude.lower()
    if mode in ("no other", "no_other"):
        return total
    cur = col.cast("double")
    n = count_exclude(col, frame, partition_by, order_by, exclude)
    if mode in ("current row", "current_row"):
        return F.when(n > 0, total - F.coalesce(cur, F.lit(0.0)))
    peers = F.sum(col).over(_peer_window(partition_by, order_by))
    if mode == "group":
        return F.when(n > 0, total - F.coalesce(peers, F.lit(0.0)))
    if mode == "ties":
        return F.when(
            n > 0, total - F.coalesce(peers, F.lit(0.0)) + F.coalesce(cur, F.lit(0.0))
        )
    raise ValueError(f"unknown EXCLUDE mode {exclude!r}")


def count_exclude(
    col: Column,
    frame: WindowSpec,
    partition_by: list,
    order_by: list,
    exclude: str = "current row",
) -> Column:
    total = F.count(col).over(frame)
    mode = exclude.lower()
    if mode in ("no other", "no_other"):
        return total
    not_null = F.when(col.isNotNull(), 1).otherwise(0)
    if mode in ("current row", "current_row"):
        return total - not_null
    peers = F.count(col).over(_peer_window(partition_by, order_by))
    if mode == "group":
        return total - peers
    if mode == "ties":
        return total - peers + not_null
    raise ValueError(f"unknown EXCLUDE mode {exclude!r}")


def avg_exclude(
    col: Column,
    frame: WindowSpec,
    partition_by: list,
    order_by: list,
    exclude: str = "current row",
) -> Column:
    s = sum_exclude(col, frame, partition_by, order_by, exclude)
    c = count_exclude(col, frame, partition_by, order_by, exclude)
    return F.when(c > 0, s / c)
