"""Sketch / summary operators (SURVEY.md §2.4 holistic tail + SUMMARIZE).

- approx_top_k (reference approx_top_k.cpp, filtered-space-saving): on
  Spark the scalable implementation is exact partial top-k — per-partition
  count + global combine is cheaper than a sketch until cardinality
  explodes, then `maxsize` caps memory like the sketch's bucket bound.
- lttb (reference lttb.cpp, Largest-Triangle-Three-Buckets downsampling,
  Steinarsson 2013): sequential by nature (each choice depends on the
  previous selected point) → per-series applyInPandas; series are
  partitioned by key so each pandas group is one series (the operator's
  contract — same as any time-series downsampler).
- summarize (reference bind_summarize.cpp): per-column min/max/
  approx_unique/avg/std/quantiles/null% in ONE aggregation pass over a
  single scan (Spark computes all column aggregates together).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def approx_top_k(
    df: DataFrame, col: str, k: int = 10, by: list[str] | None = None
) -> DataFrame:
    """Top-k most frequent values of `col` (optionally per `by` group).
    Output: (*by, value, cnt, rank) — rank by count desc, value asc."""
    by = by or []
    counts = df.groupBy(*by, F.col(col).alias("value")).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(*by).orderBy(F.desc("cnt"), F.asc("value"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lttb(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_out: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling to n_out points per
    series. Exact sequential algorithm per series via applyInPandas."""
    by = by or []

    def _lttb_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf
        xs = pdf[x_col].astype("float64").to_numpy()
        ys = pdf[y_col].astype("float64").to_numpy()
        # bucket boundaries: first and last point always kept
        import numpy as np

        idx = [0]
        bucket_edges = np.linspace(1, n - 1, n_out - 1).astype(int)
        a = 0
        for b in range(n_out - 2):
            lo, hi = bucket_edges[b], bucket_edges[b + 1]
            if hi <= lo:
                hi = lo + 1
            nxt_lo, nxt_hi = bucket_edges[b + 1], (
                bucket_edges[b + 2] if b + 2 < len(bucket_edges) else n
            )
            avg_x = xs[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else xs[-1]
            avg_y = ys[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else ys[-1]
            # max triangle area vs previous selected point and next-bucket avg
            area = np.abs(
                (xs[a] - avg_x) * (ys[lo:hi] - ys[a]) - (xs[a] - xs[lo:hi]) * (avg_y - ys[a])
            )
            chosen = lo + int(area.argmax())
            idx.append(chosen)
            a = chosen
        idx.append(n - 1)
        return pdf.iloc[sorted(set(idx))]

    if by:
        return df.groupBy(*by).applyInPandas(_lttb_pdf, df.schema)
    return df.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(
        lambda pdf: _lttb_pdf(pdf.drop(columns="__g")), df.schema
    )


def summarize(df: DataFrame) -> DataFrame:
    """SUMMARIZE (reference bind_summarize.cpp): one row per column with
    min/max/approx_unique/avg/std/q25/q50/q75/count/null_percentage.
    Single aggregation pass; numeric stats NULL for non-numeric columns."""
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() in
        ("int", "bigint", "smallint", "tinyint", "double", "float")
        or f.dataType.simpleString().startswith("decimal")
    }
    aggs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs += [
            F.min(c).cast("string").alias(f"{f.name}__min"),
            F.max(c).cast("string").alias(f"{f.name}__max"),
            F.approx_count_distinct(c).alias(f"{f.name}__uniq"),
            (F.avg(c) if f.name in numeric else F.lit(None)).cast("double").alias(f"{f.name}__avg"),
            (F.stddev_samp(c) if f.name in numeric else F.lit(None)).cast("double").alias(f"{f.name}__std"),
            (F.percentile_approx(c, 0.25) if f.name in numeric else F.lit(None)).cast("double").alias(f"{f.name}__q25"),
            (F.percentile_approx(c, 0.5) if f.name in numeric else F.lit(None)).cast("double").alias(f"{f.name}__q50"),
            (F.percentile_approx(c, 0.75) if f.name in numeric else F.lit(None)).cast("double").alias(f"{f.name}__q75"),
            F.count(c).alias(f"{f.name}__cnt"),
            F.count("*").alias(f"{f.name}__tot"),
        ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out_rows = []
    for f in df.schema.fields:
        tot = row[f"{f.name}__tot"]
        cnt = row[f"{f.name}__cnt"]
        out_rows.append(
            (
                f.name,
                f.dataType.simpleString(),
                row[f"{f.name}__min"],
                row[f"{f.name}__max"],
                row[f"{f.name}__uniq"],
                row[f"{f.name}__avg"],
                row[f"{f.name}__std"],
                row[f"{f.name}__q25"],
                row[f"{f.name}__q50"],
                row[f"{f.name}__q75"],
                tot,
                round(100.0 * (tot - cnt) / tot, 2) if tot else None,
            )
        )
    return spark.createDataFrame(
        out_rows,
        "column_name string, column_type string, min string, max string, "
        "approx_unique long, avg double, std double, q25 double, q50 double, "
        "q75 double, count long, null_percentage double",
    )
