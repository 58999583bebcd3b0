"""SparkSession factory tuned for the engine.

Scale posture (see SURVEY.md §4/§7): we rely on Catalyst + AQE for the
optimizer passes DuckDB hand-implements (join reordering, runtime bloom
filters, skew handling, partition coalescing).  The configs below are the
"always on" set; they are safe on local[N] and are exactly what a
1000-executor cluster deployment would use (only memory/parallelism sizing
differs, which deployers override via spark-submit conf).

Reference parity notes:
- DuckDB timestamps are timezone-naive UTC; we pin the session timezone to
  UTC so TimestampType comparisons against the DuckDB oracle agree.
- The driver's events table carries parquet TIMESTAMP(NANOS); Spark rejects
  that type unless `nanosAsLong` is set, after which catalog.py converts
  ns → µs exactly like DuckDB's reader truncates (verified empirically).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs every deployment wants.  Keys are public Spark SQL conf names.
ENGINE_CONF: dict[str, str] = {
    # AQE: runtime re-planning — replaces DuckDB's build/probe-side optimizer,
    # skew handling and partition sizing (SURVEY.md §4).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime bloom filters ≈ DuckDB's join_filter_pushdown_optimizer
    # (build-side filters injected into probe scans).
    # NOTE: runtimeFilter.semiJoinReduction is deliberately NOT enabled —
    # empirically it sends the planner into a loop on this Spark build
    # (even a bare parquet count hangs).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # CBO for join reordering (DuckDB: DPhyp enumerator).
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Arrow for any pandas-UDF slow path + toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # DuckDB semantics: naive-UTC timestamps.
    "spark.sql.session.timeZone": "UTC",
    # Read parquet TIMESTAMP(NANOS) as long (catalog converts to µs).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Broadcast threshold: dims (region/nation/supplier/part at small SF)
    # should broadcast; AQE also converts post-shuffle when sizes allow.
    # 16 MB, NOT larger: the planner compares against the column-pruned
    # size ESTIMATE, and at 64 MB a 6M-row lineitem scan (523 MB in-memory)
    # was estimated under the bar and broadcast — measured 13.5s for TPC-H
    # q05 at sf1 vs 1.5s after the fix. On a cluster the same reasoning
    # holds: broadcasts must stay driver/executor-memory-sized.
    "spark.sql.autoBroadcastJoinThreshold": str(16 * 1024 * 1024),
    # Prefer shuffled-HASH join over sort-merge when the planner's build-side
    # guards hold (side < partitions×broadcastThreshold and 3× smaller than
    # the probe). Sort-merge sorts BOTH shuffled sides — for TPC-H's
    # fact⋈filtered-fact joins that is a 6M-row sort per side that the hash
    # build avoids entirely (q18 9.3→5.5 s, q21/q05/q03 similar at sf1;
    # this is exactly the hash-join strategy the reference engine uses).
    # Scale posture: the size guards keep gigantic builds on the SMJ path,
    # and AQE's OptimizeSkewedJoin handles SHJ skew splitting since 3.2.
    "spark.sql.join.preferSortMergeJoin": "false",
    # Native WITH RECURSIVE: Spark's default level cap (100) is far below
    # the reference's long-thin recursions (5000 single-row levels in
    # cte/recursive_cte_parallel_union_all_sink.test). 10k, not huge:
    # infinite recursions drained by an outer LIMIT (which Spark does not
    # push into the loop) must still terminate in bounded time.
    "spark.sql.cteRecursionLevelLimit": "10000",
}


def get_spark(
    app_name: str = "duckdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) the engine's SparkSession.

    `SPARK_GRAFT_CPUS` (driver contract) sizes local parallelism; shuffle
    partitions default to the core count — on a real cluster deployers set
    both explicitly and AQE coalescing fixes over-partitioning at runtime.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.ui.enabled", "false")
    # 24g, not larger: with 32 executor threads a bigger heap just extends
    # G1 young regions and lengthens pauses (measured: 48g heap showed 2-3×
    # run-to-run variance on shuffle-heavy queries that 16-24g doesn't).
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
