"""ASOF join — flagship custom operator (SURVEY.md §2.3).

Reference semantics: `src/execution/operator/join/physical_asof_join.cpp`
(+ `test/sql/join/asof/test_asof_join.test`): for each probe row, match the
single build row with the greatest order-key ≤ the probe's order key
(inequality `>=`), optionally within equality partition keys; LEFT variant
emits NULLs on no-match.

Spark-first implementation ("union trick", no per-row Python):
tag both sides, union on (keys, order), and run a single
`last(build_payload, ignorenulls=True)` window scan ordered by
(order_key, is_probe) — each probe row then carries the payload of the most
recent build row at-or-before it. One shuffle on the equality keys (same
partitioning DuckDB's partitioned sort uses), fully JVM-side, scales to
arbitrary build/probe sizes without a range cross-product.

Why not `pd.merge_asof` per group: that pulls each group through Python/
Arrow; the window formulation stays in Tungsten and handles skewed keys via
AQE. (A group-local merge_asof would also break on groups larger than
memory.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    how: str = "inner",
    suffix: str = "_asof",
) -> DataFrame:
    """ASOF join probe↔build on ordered column `on`, equality keys `by`.

    direction="backward": match greatest build.on <= probe.on (DuckDB
    default `>=` inequality); "forward": least build.on >= probe.on.
    how: "inner" (drop unmatched probes) or "left".
    Build payload columns are suffixed when they collide with probe columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof direction must be backward/forward, got {direction}")
    if how not in ("inner", "left"):
        raise ValueError(f"asof how must be inner/left, got {how}")
    by = [by] if isinstance(by, str) else list(by or [])

    payload_cols = [c for c in build.columns if c not in by and c != on]
    renames = {c: (c + suffix if c in probe.columns else c) for c in payload_cols}
    build_on_out = (on + suffix) if on in probe.columns else on + "_build"

    probe_cols = probe.columns
    # tag: build __side=0, probe __side=1 — at equal order keys the build
    # row sorts first in scan order (asc for backward, desc for forward),
    # so a probe row matches a build row at the same key (DuckDB `>=`).
    b = build.select(
        *[F.col(k) for k in by],
        F.col(on).alias("__ord"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(on).alias("__bon"), *[F.col(c).alias(renames[c]) for c in payload_cols]
        ).alias("__payload"),
    )
    p = probe.select(
        *[F.col(k) for k in by],
        F.col(on).alias("__ord"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(b.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols],
    )
    b = b.select(*by, "__ord", "__side", "__payload",
                 *[F.lit(None).cast(p.schema[f"__p_{c}"].dataType).alias(f"__p_{c}") for c in probe_cols])

    unioned = b.unionByName(p)
    ord_key = F.col("__ord").asc() if direction == "backward" else F.col("__ord").desc()

    if by:
        w = (
            Window.partitionBy(*by)
            .orderBy(ord_key, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    else:
        # Global ASOF (no equality keys): Window.partitionBy() would put the
        # ENTIRE union in one task — the 100 TB scale-killer flagged in the
        # round-1 audit. Instead: range-bucket on the order key (equi-depth
        # boundaries from approxQuantile), window within each bucket, and
        # carry each bucket's boundary payload across buckets via a
        # bucket-level (tiny: n_buckets rows) window + broadcast join back.
        matched = _bucketed_global_match(unioned, direction)

    out = (
        matched.filter(F.col("__side") == 1)
        .select(
            *[F.col(f"__p_{c}").alias(c) for c in probe_cols],
            F.col("__match.__bon").alias(build_on_out),
            *[F.col(f"__match.{renames[c]}").alias(renames[c]) for c in payload_cols],
        )
    )
    if how == "inner":
        out = out.filter(F.col(build_on_out).isNotNull())
    return out


def asof_self_join(
    df: DataFrame,
    on: str,
    by: list[str] | str | None,
    probe_pred,
    build_pred,
    build_payload: list[str],
    direction: str = "backward",
    how: str = "inner",
    suffix: str = "_asof",
) -> DataFrame:
    """ASOF join where probe and build are DISJOINT row slices of the SAME
    frame (e.g. two event types of one fact table).

    `asof_join(df.filter(p), df.filter(b), ...)` unions two scans of the
    same table — the only headline plan that read its fact twice (guide
    §2.4/§6). Here the tagged union is built by CONDITIONAL PROJECTION over
    one scan: each row becomes exactly one union row (build if build_pred,
    probe if probe_pred), so the window input is row-for-row identical to
    the union form and the match result is unchanged — with ONE scan,
    pushdown-filtered to (probe_pred OR build_pred).

    Preconditions: probe_pred and build_pred must be disjoint (a row
    matching both would need to appear on both sides — use asof_join), and
    rows matching neither are dropped.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof direction must be backward/forward, got {direction}")
    if how not in ("inner", "left"):
        raise ValueError(f"asof how must be inner/left, got {how}")
    by = [by] if isinstance(by, str) else list(by or [])
    probe_cols = df.columns
    payload_cols = [c for c in build_payload if c not in by and c != on]
    renames = {c: (c + suffix if c in probe_cols else c) for c in payload_cols}
    build_on_out = (on + suffix) if on in probe_cols else on + "_build"

    payload = F.struct(
        F.col(on).alias("__bon"),
        *[F.col(c).alias(renames[c]) for c in payload_cols],
    )
    unioned = df.filter(probe_pred | build_pred).select(
        *[F.col(k) for k in by],
        F.col(on).alias("__ord"),
        F.when(build_pred, F.lit(0)).otherwise(F.lit(1)).alias("__side"),
        F.when(build_pred, payload).alias("__payload"),
        *[F.when(probe_pred, F.col(c)).alias(f"__p_{c}") for c in probe_cols],
    )

    ord_key = F.col("__ord").asc() if direction == "backward" else F.col("__ord").desc()
    if by:
        w = (
            Window.partitionBy(*by)
            .orderBy(ord_key, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    else:
        matched = _bucketed_global_match(unioned, direction)

    out = (
        matched.filter(F.col("__side") == 1)
        .select(
            *[F.col(f"__p_{c}").alias(c) for c in probe_cols],
            F.col("__match.__bon").alias(build_on_out),
            *[F.col(f"__match.{renames[c]}").alias(renames[c]) for c in payload_cols],
        )
    )
    if how == "inner":
        out = out.filter(F.col(build_on_out).isNotNull())
    return out


def _bucketed_global_match(unioned: DataFrame, direction: str) -> DataFrame:
    """Two-pass global ASOF match: per-bucket window + cross-bucket carry.

    Buckets come from approxQuantile over the order key (equi-depth, so a
    hot time range doesn't produce one giant bucket); every bucket's
    within-bucket scan is an independent task. The carry structure is one
    row per bucket — driver-scale regardless of data size."""
    spark = unioned.sparkSession
    n_buckets = spark.sparkContext.defaultParallelism
    # cache: the union is scanned twice (bucket assignment reuses it)
    unioned = unioned.localCheckpoint(eager=True)
    # approxQuantile needs a numeric column; timestamps go through double
    # (ordering-preserving, only used for bucket boundaries)
    numeric = unioned.select(F.col("__ord").cast("double").alias("__o"))
    bounds = numeric.approxQuantile(
        "__o", [i / n_buckets for i in range(1, n_buckets)], 0.01
    )
    bounds = sorted(set(bounds))
    blit = F.array(*[F.lit(x) for x in bounds])
    bucket = F.size(F.filter(blit, lambda bd: bd < F.col("__ord").cast("double")))
    df = unioned.withColumn("__bucket", bucket)

    backward = direction == "backward"
    in_ord = F.col("__ord").asc() if backward else F.col("__ord").desc()
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(in_ord, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("__local", F.last("__payload", ignorenulls=True).over(w_in))

    # Per-bucket boundary payload: the build row a later (earlier, for
    # forward) bucket would see at its start.
    agg_fn = F.max_by if backward else F.min_by
    per_bucket = (
        df.filter(F.col("__side") == 0)
        .groupBy("__bucket")
        .agg(agg_fn("__payload", "__ord").alias("__edge"))
    )
    all_buckets = spark.range(len(bounds) + 1).select(F.col("id").cast("int").alias("__bucket"))
    carry_ord = F.col("__bucket").asc() if backward else F.col("__bucket").desc()
    w_carry = Window.orderBy(carry_ord).rowsBetween(Window.unboundedPreceding, -1)
    seeds = (
        all_buckets.join(per_bucket, "__bucket", "left")
        .withColumn("__seed", F.last("__edge", ignorenulls=True).over(w_carry))
        .select("__bucket", "__seed")
    )
    return local.join(F.broadcast(seeds), "__bucket").withColumn(
        "__match", F.coalesce(F.col("__local"), F.col("__seed"))
    )
