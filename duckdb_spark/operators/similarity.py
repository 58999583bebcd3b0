"""Similarity search over embedding columns (beyond-reference spec).

- `cosine_topk`: exact brute-force top-k neighbors for a set of query
  vectors. Queries are broadcast (they're small by construction); each
  corpus partition computes dot products scan-local; per-query top-k via
  window row_number — Spark turns the global sort+limit per key into
  partial top-k heaps. Scales linearly in corpus size.
- `lsh_buckets` / `lsh_topk`: random-hyperplane (sign) LSH — deterministic
  hyperplanes derived from md5 so runs are reproducible. Bucketing cuts
  the candidate set from n to n/2^p per table; multiple tables recover
  recall. This is the 100 TB path: candidates co-shuffle by bucket key.

DuckDB-surface parity: list_cosine_similarity / list_inner_product /
list_distance (<=> / <-> operators) are in functions/scalar.py; these
operators compose them into search primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_spark.operators.dedup import hash64


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, vec_id, cosine, rank). Ties broken by vec_id for
    determinism."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = (
        c.join(F.broadcast(q))  # broadcast cross join: corpus stays put
        .withColumn("cosine", _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def _hyperplane(plane: int, dim: int):
    """Deterministic pseudo-random unit-ish hyperplane component h[plane,d]
    ∈ (-1, 1): from md5 — reproducible across engines/runs."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"plane{plane}_"), d.cast("string"))), 1, 8),
                16, 10,
            ).cast("double") / F.lit(float(0xFFFFFFFF)) * 2.0 - 1.0
        ),
    )


def lsh_buckets(df: DataFrame, vec_col: str, dim: int, num_planes: int = 8) -> DataFrame:
    """Add `bucket`: sign-LSH key from num_planes random hyperplanes."""
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        bucket = bucket + F.when(_dot(v, _hyperplane(p, dim)) >= 0,
                                 F.lit(1 << p).cast("long")).otherwise(0)
    return df.withColumn("bucket", bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rank within candidates. One equi-join shuffle on the
    bucket key instead of a full cross product."""
    c = lsh_buckets(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("cv")),
        "cv", dim, num_planes,
    )
    q = lsh_buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")),
        "qv", dim, num_planes,
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .withColumn("cosine", _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank")
    )
