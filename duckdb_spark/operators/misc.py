"""Assorted relational operators the reference exposes (SURVEY.md §2.6/§2.2).

- DISTINCT ON (reference: `src/planner/operator/logical_distinct.cpp`,
  DISTINCT ON keeps one row per key set) → row_number window + rn=1 filter.
- POSITIONAL JOIN (reference `physical_positional_join.cpp`) → row_number
  over a known total order + equi-join on the index. NOTE: a no-order
  row_number needs a single partition; callers must provide order columns
  for distributed execution — same caveat DuckDB documents (positional
  join is only meaningful for aligned inputs).
- Reservoir sample (reference `physical_reservoir_sample.cpp`,
  `USING SAMPLE n ROWS`): fixed-size uniform sample via rand()-keyed top-k
  (TABLESAMPLE-style distributed reservoir; single shuffle of k rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_on(
    df: DataFrame,
    keys: list[str],
    order_by: list,
    keep: str = "first",
) -> DataFrame:
    """SELECT DISTINCT ON (keys) ... ORDER BY order_by — keep first/last
    row per key group under the given order (deterministic, unlike raw
    DuckDB DISTINCT ON without ORDER BY)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if keep == "last":
        cols = [c.desc() for c in cols]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def positional_join(left: DataFrame, right: DataFrame, left_order: list[str],
                    right_order: list[str], how: str = "full") -> DataFrame:
    """Align two relations row-by-row under explicit total orders.

    SCALE WARNING (emitted at plan time): the global row_number puts each
    side through a single-partition window — positional alignment is
    inherently a total order. Fine for the aligned-small-inputs use DuckDB
    documents for POSITIONAL JOIN; do not feed fact tables through this."""
    import warnings

    warnings.warn(
        "positional_join computes a global row_number (single-partition "
        "window per side); intended for small aligned inputs only",
        stacklevel=2,
    )
    wl = Window.orderBy(*[F.col(c) for c in left_order])
    wr = Window.orderBy(*[F.col(c) for c in right_order])
    l = left.withColumn("__pos", F.row_number().over(wl))
    r = right.withColumn("__pos", F.row_number().over(wr))
    return l.join(r, "__pos", how).drop("__pos")


def reservoir_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Fixed-size uniform random sample of n rows (reservoir semantics):
    every row gets a uniform key; global top-n by key is a uniform sample.
    Spark plans this as TakeOrderedAndProject — per-partition heaps of n,
    then a driver merge of k*n candidates; no full sort, no full shuffle."""
    return (
        df.withColumn("__r", F.rand(seed))
        .orderBy("__r")
        .limit(n)
        .drop("__r")
    )


def sample_percent(df: DataFrame, pct: float, seed: int = 42) -> DataFrame:
    """Bernoulli USING SAMPLE pct% — native, scan-local, no shuffle."""
    return df.sample(fraction=pct / 100.0, seed=seed)


def hash_sample(df: DataFrame, pct: float, key_cols: list[str]) -> DataFrame:
    """Deterministic bernoulli sample: keep rows where
    md5(key) mod 1000 < pct*10. Engine-independent (md5 is identical
    everywhere), scan-local, no shuffle, reproducible across runs and
    engines — the sampling strategy to use when downstream must be
    auditable (the reference's setseed+system sample is engine-RNG-bound).
    """
    key = F.concat_ws("\x01", *[F.col(c).cast("string") for c in key_cols])
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 1000
    return df.filter(bucket < int(pct * 10))


def limit_percent(df: DataFrame, pct: float) -> DataFrame:
    """LIMIT x% (reference physical_limit_percent.cpp:145 — the row count
    is `idx_t(percent/100*count)`, i.e. truncation) — two-pass."""
    n = df.count()
    return df.limit(int(n * pct / 100.0))
