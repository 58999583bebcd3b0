"""Banded range join — the scalable plan for IEJoin-class queries.

Reference: `src/execution/operator/join/physical_iejoin.cpp` (2-predicate
inequality joins, "Fast inequality joins" paper) and
`physical_piecewise_merge_join.cpp` (single range predicate). Spark plans
pure inequality joins as BNLJ (quadratic); the idiomatic distributed
strategy when the predicate is a bounded *band* (|a.x − b.x| ≤ w, the
overwhelmingly common case: temporal proximity, value tolerance) is
bucketize-and-equi-join:

    bucket(x) = floor(x / w)  →  a matches b only if their buckets differ
    by at most 1  →  explode one side into {bucket−1, bucket, bucket+1},
    equi-join on bucket, re-check the exact predicate.

One shuffle on the bucket key, 3× duplication of one side, no quadratic
blowup. Bucket skew (hot time ranges) is handled by AQE skew-join.
For unbounded inequalities (a.x < b.x with no band) the correct fallback
is the sort-merge formulation or BNLJ — exposed as `theta_join` with an
explicit warning in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    band: float,
    how: str = "inner",
    extra_cond: Column | None = None,
) -> DataFrame:
    """Join rows where |left.left_on − right.right_on| ≤ band (numeric or
    epoch-cast columns). Returns the joined frame with both sides' columns
    (right-side collisions suffixed `_r`)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"banded_range_join supports how='inner'|'left', got {how!r}"
        )
    lcol = F.col(left_on).cast("double")
    renames = {c: (c + "_r" if c in left.columns else c) for c in right.columns}

    l = left.withColumn("__bucket", F.floor(lcol / band).cast("long"))
    r = right.select(
        *[F.col(c).alias(renames[c]) for c in right.columns]
    ).withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(F.col(renames[right_on]).cast("double") / band).cast("long") - 1,
                F.floor(F.col(renames[right_on]).cast("double") / band).cast("long"),
                F.floor(F.col(renames[right_on]).cast("double") / band).cast("long") + 1,
            )
        ),
    )
    cond = (
        F.abs(F.col(left_on).cast("double") - F.col(renames[right_on]).cast("double")) <= band
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    # The 3 exploded buckets per right row are distinct and each left row has
    # one bucket ⇒ a qualifying pair joins on exactly one bucket value — the
    # inner result has no explode-duplicates.
    if how == "inner":
        return l.join(r, "__bucket", "inner").filter(cond).drop("__bucket")
    # LEFT: the band predicate can't be filtered post-join (NULL on
    # unmatched rows would drop them) — take the inner matches, then append
    # left rows with no match, right side NULL. The __lid assignment is
    # materialized once (monotonically_increasing_id is nondeterministic;
    # the two plan branches below must see identical ids).
    l_id = l.withColumn(
        "__lid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    inner = l_id.join(r, "__bucket", "inner").filter(cond).drop("__bucket")
    rcols = [renames[c] for c in right.columns]
    unmatched = l_id.drop("__bucket").join(
        inner.select("__lid").distinct(), "__lid", "left_anti"
    ).select(
        *[F.col(c) for c in left.columns],
        F.col("__lid"),
        *[F.lit(None).cast(dict(r.dtypes)[c]).alias(c) for c in rcols],
    )
    return inner.unionByName(unmatched).drop("__lid")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    max_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (x ∈ [lo, hi]) with bounded interval width:
    intervals explode into ceil(width/band)+1 buckets; points join their
    single bucket. The reference plans this on the IEJoin path; here it is
    one equi-shuffle."""
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports how='inner'|'left', got {how!r}")
    band = max_width
    p = points.withColumn("__bucket", F.floor(F.col(point_col).cast("double") / band).cast("long"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("double") / band).cast("long"),
                F.floor(F.col(hi_col).cast("double") / band).cast("long"),
            )
        ),
    )
    cond = (
        F.col(point_col).cast("double") >= F.col(lo_col).cast("double")
    ) & (F.col(point_col).cast("double") <= F.col(hi_col).cast("double"))
    # Each point has exactly one bucket ⇒ no explode-duplicates in the inner.
    if how == "inner":
        return p.join(iv, "__bucket", "inner").filter(cond).drop("__bucket")
    # Materialized once — see banded_range_join: both branches need one id set.
    p_id = p.withColumn(
        "__lid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    inner = p_id.join(iv, "__bucket", "inner").filter(cond).drop("__bucket")
    unmatched = p_id.drop("__bucket").join(
        inner.select("__lid").distinct(), "__lid", "left_anti"
    ).select(
        *[F.col(c) for c in points.columns],
        F.col("__lid"),
        *[F.lit(None).cast(dict(intervals.dtypes)[c]).alias(c) for c in intervals.columns],
    )
    return inner.unionByName(unmatched).drop("__lid")


def theta_join(left: DataFrame, right: DataFrame, cond: Column, how: str = "inner") -> DataFrame:
    """Arbitrary inequality join — correctness fallback (Spark BNLJ /
    cartesian; quadratic). Prefer banded_range_join whenever the predicate
    is a band."""
    return left.join(right, cond, how)
