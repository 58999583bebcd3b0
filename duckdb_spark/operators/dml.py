"""DML over immutable storage: MERGE / UPDATE / DELETE as rewrite plans.

Reference surface (SURVEY.md §2.1): `physical_insert.cpp`,
`physical_delete.cpp`, `physical_update.cpp`, `physical_merge_into.cpp`
with RETURNING. DuckDB mutates row groups under MVCC; Spark's idiomatic
equivalent over parquet is the *rewrite pattern* (the same shape Delta/
Iceberg implement under the hood): compute the post-image DataFrame, write
it atomically (overwrite), optionally emitting the changed-rows DataFrame
(≈ RETURNING).

These operators return the post-image lazily — callers decide whether to
`copy_to` it (full rewrite) or partition-overwrite. At 100 TB you'd pair
this with partition pruning: `merge_into(..., partition_filter=...)` keeps
the rewrite scoped to touched partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete_where(table: DataFrame, cond: Column) -> tuple[DataFrame, DataFrame]:
    """DELETE ... WHERE cond → (post_image, deleted_rows ≈ RETURNING)."""
    return table.filter(~cond | cond.isNull()), table.filter(cond)


def update_where(
    table: DataFrame, cond: Column, assignments: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """UPDATE ... SET col=expr WHERE cond → (post_image, updated_rows).

    RETURNING semantics (reference physical_update.cpp): rows are matched on
    their PRE-update values and their POST-update values are returned — so
    the WHERE flag is computed on the pre-image before assignments apply
    (SET bal=0 WHERE bal<0 must return the zeroed rows, not an empty set).
    """
    flagged = table.withColumn("__hit", F.coalesce(cond, F.lit(False)))
    post_flagged = flagged.select(
        "__hit",
        *[
            (
                F.when(F.col("__hit"), assignments[c]).otherwise(F.col(c))
                if c in assignments
                else F.col(c)
            ).alias(c)
            for c in table.columns
        ],
    )
    post = post_flagged.drop("__hit")
    updated = post_flagged.filter(F.col("__hit")).drop("__hit")
    return post, updated


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched_update: dict[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    when_not_matched_insert: bool = True,
    insert_values: dict[str, Column] | None = None,
) -> DataFrame:
    """MERGE INTO target USING source ON keys — post-image DataFrame.

    Plan shape (one shuffle on the join keys, AQE-sized):
      matched    = target ⋈ source (inner)  → update/delete branches
      unmatched  = target ⟕̸ source (anti)  → kept as-is
      inserts    = source ⟕̸ target (anti)  → appended when requested
    """
    tcols = target.columns
    t = target.alias("t")
    s = source.alias("s")

    unmatched = t.join(s, on, "left_anti").select(*[F.col(c) for c in tcols])

    matched = t.join(s, on, "inner")
    if when_matched_delete is not None:
        matched = matched.filter(~when_matched_delete | when_matched_delete.isNull())
    if when_matched_update:
        matched_out = matched.select(
            *[
                (when_matched_update[c] if c in when_matched_update else F.col(f"t.{c}")).alias(c)
                for c in tcols
            ]
        )
    else:
        matched_out = matched.select(*[F.col(f"t.{c}").alias(c) for c in tcols])

    out = unmatched.unionByName(matched_out)
    if when_not_matched_insert:
        inserts = s.join(t, on, "left_anti")
        # align to target schema: explicit insert_values mapping wins, then
        # same-name source columns, else NULL
        iv = insert_values or {}
        inserts = inserts.select(
            *[
                (
                    iv[c] if c in iv else (F.col(c) if c in inserts.columns else F.lit(None))
                ).cast(dict(target.dtypes)[c]).alias(c)
                for c in tcols
            ]
        )
        out = out.unionByName(inserts)
    return out


def insert_returning(table: DataFrame, rows: DataFrame) -> tuple[DataFrame, DataFrame]:
    """INSERT ... RETURNING * → (post_image, inserted_rows)."""
    aligned = rows.select(
        *[
            (F.col(c) if c in rows.columns else F.lit(None)).cast(dict(table.dtypes)[c]).alias(c)
            for c in table.columns
        ]
    )
    return table.unionByName(aligned), aligned
