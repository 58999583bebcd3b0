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


def approx_top_k_sketch(
    df: DataFrame,
    col: str,
    k: int = 10,
    by: list[str] | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """MERGEABLE approximate top-k: distributed filtered-space-saving
    (reference extension/core_functions/aggregate/holistic/approx_top_k.cpp
    keeps `capacity` monitored values with an error bound; merge sums
    counts and propagates the bound).

    Spark formulation — the sketch IS the shuffle bound:
      map side  : mapInPandas keeps ≤ `buckets` (value, exact-in-partition
                  count) pairs per group per partition; the (buckets+1)-th
                  largest count becomes that partition's epsilon (any value
                  dropped here appeared ≤ epsilon times in the partition).
                  Arrow-batched, column-pruned input, state per partition.
      merge side: one groupBy over ≤ buckets·partitions rows — cnt_lo =
                  Σ emitted counts; cnt_hi = cnt_lo + Σ epsilon of the
                  partitions that did NOT emit the value. Top-k ranked by
                  cnt_lo (desc, value asc tie-break).

    With per-partition group cardinality ≤ buckets, epsilon is 0 everywhere
    and cnt_lo == cnt_hi == the exact count (the regime the differential
    oracle pins); beyond that the bound degrades gracefully exactly like
    the reference sketch. Shuffle payload is capped at buckets rows per
    partition per group regardless of input cardinality — the property
    that makes this scale where exact counting shuffles every distinct
    value.

    Output: (*by, value, cnt_lo, cnt_hi, rank), rank ≤ k.
    """
    by = by or []
    buckets = buckets or 8 * k
    narrow = df.select(*by, col)
    fields = narrow.schema.fields
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
        + ", __cnt long, __eps long, __is_eps boolean"
    )

    def _fss(batches):
        # per-partition state: {group_key: {value: count}}
        state: dict = {}
        for pdf in batches:
            grouped = (
                pdf.groupby(list(by), dropna=False, sort=False)
                if by
                else [((), pdf)]
            )
            for key, g in grouped:
                if by and not isinstance(key, tuple):
                    key = (key,)
                counts = state.setdefault(key, {})
                for v, c in g[col].value_counts(dropna=True).items():
                    counts[v] = counts.get(v, 0) + int(c)
        for key, counts in state.items():
            items = sorted(counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
            kept, dropped = items[:buckets], items[buckets:]
            eps = dropped[0][1] if dropped else 0
            rows = [(*key, v, c, eps, False) for v, c in kept]
            rows.append((*key, None, 0, eps, True))  # per-partition eps row
            yield pd.DataFrame(
                rows, columns=[*by, col, "__cnt", "__eps", "__is_eps"]
            )

    partial = narrow.mapInPandas(_fss, schema=out_schema)
    cand = (
        partial.where(~F.col("__is_eps"))
        .groupBy(*by, F.col(col).alias("value"))
        .agg(
            F.sum("__cnt").alias("cnt_lo"),
            F.sum("__eps").alias("__eps_emitted"),
        )
    )
    eps_tot = (
        partial.where(F.col("__is_eps"))
        .groupBy(*by)
        .agg(F.sum("__eps").alias("__eps_tot"))
    )
    joined = (
        cand.join(F.broadcast(eps_tot), on=by, how="left")
        if by
        else cand.crossJoin(F.broadcast(eps_tot))
    )
    w = Window.partitionBy(*by).orderBy(F.desc("cnt_lo"), F.asc("value"))
    return (
        joined.withColumn(
            "cnt_hi",
            F.col("cnt_lo") + F.coalesce(F.col("__eps_tot"), F.lit(0))
            - F.col("__eps_emitted"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("__eps_emitted", "__eps_tot")
    )
