"""VARIANT function surface unit tests (reference test/sql/function/variant/).

Edge semantics pinned against the reference's own .test expectations:
variant_typeof detail names (variant_typeof.test), 1-based array indexing
with index-0 rejection (variant_extract.cpp:19), null-valued key exists vs
absent key, duplicate keys last-wins + sorted normalize (json_cast.test),
recursive variant_contains (variant_contains.cpp RecursiveHaystackWalk).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_spark.functions import variant as V


def _one(spark, json_text, col):
    df = spark.createDataFrame([(json_text,)], "j string").select(
        V.to_variant("j").alias("v")
    )
    return df.select(col.alias("out")).collect()[0]["out"]


JSON = '{"a": 42, "b": [1, 2, true], "c": {"x": "s", "y": null}, "n": null}'


def test_variant_extract_paths(spark):
    assert _one(spark, JSON, V.variant_extract("v", "a").cast("string")) == "42"
    # compound path, 1-based index (variant_extract.test shorthand section)
    assert _one(spark, JSON, V.variant_extract("v", "b[3]").cast("string")) == "true"
    assert _one(spark, JSON, V.variant_extract("v", "b", 1).cast("string")) == "1"
    assert _one(spark, JSON, V.variant_extract("v", "c.x").cast("string")) == "s"
    assert _one(spark, JSON, V.variant_extract("v", "missing").cast("string")) is None


def test_variant_extract_index_zero_rejected(spark):
    with pytest.raises(ValueError, match="1-based"):
        V.variant_extract(F.col("v"), 0)
    with pytest.raises(ValueError, match="1-based"):
        V.variant_extract(F.col("v"), "b[0]")


def test_variant_typeof_names(spark):
    # variant_typeof.test: OBJECT(keys) / ARRAY(n) / BOOL_* / VARIANT_NULL
    assert _one(spark, JSON, V.variant_typeof("v")) == "OBJECT(a, b, c, n)"
    assert _one(spark, JSON, V.variant_typeof("v", "b")) == "ARRAY(3)"
    assert _one(spark, JSON, V.variant_typeof("v", "a")) == "INT64"
    assert _one(spark, JSON, V.variant_typeof("v", "b[3]")) == "BOOL_TRUE"
    assert _one(spark, JSON, V.variant_typeof("v", "c.x")) == "VARCHAR"
    assert _one(spark, JSON, V.variant_typeof("v", "n")) == "VARIANT_NULL"
    assert _one(spark, JSON, V.variant_typeof("v", "missing")) is None
    # json_cast.test:32 — fraction/oversized number reports DOUBLE
    assert _one(spark, '{"f": 1.5}', V.variant_typeof("v", "f")) == "DOUBLE"
    # plain-name variant_type (variant_type.cpp EnumUtil::ToString)
    assert _one(spark, JSON, V.variant_type("v")) == "OBJECT"
    assert _one(spark, JSON, V.variant_type("v", "b")) == "ARRAY"


def test_variant_keys_and_array_length(spark):
    # json_cast.test: keys come out sorted (dup-key inputs raise in Spark's
    # variant builder — documented divergence in to_variant; try_to_variant
    # maps them to NULL)
    assert _one(spark, '{"b":1,"a":2,"c":3}', F.array_join(V.variant_keys("v"), ",")) == "a,b,c"
    assert _one(spark, JSON, V.variant_array_length("v", "b")) == 3


def test_try_to_variant_duplicate_keys_null(spark):
    row = (
        spark.createDataFrame([('{"a":1,"a":2}',)], "j string")
        .select(V.try_to_variant("j").cast("string").alias("out"))
        .collect()[0]["out"]
    )
    assert row is None


def test_variant_exists_null_vs_absent(spark):
    # a key holding JSON null EXISTS; an absent key does not
    assert _one(spark, JSON, V.variant_exists("v", "n")) is True
    assert _one(spark, JSON, V.variant_exists("v", "c.y")) is True
    assert _one(spark, JSON, V.variant_exists("v", "c.z")) is False
    assert _one(spark, JSON, V.variant_exists("v", "b", 2)) is True
    assert _one(spark, JSON, V.variant_exists("v", "b", 9)) is False


def test_variant_normalize_canonical(spark):
    # sorted keys, minimal whitespace
    got = _one(spark, '{"b": 1, "a": {"y": 2, "x": [1, 2]}}',
               V.variant_normalized_json("v"))
    assert got == '{"a":{"x":[1,2],"y":2},"b":1}'
    got2 = _one(spark, JSON, F.to_json(V.variant_normalize("v")))
    assert got2 == '{"a":42,"b":[1,2,true],"c":{"x":"s","y":null},"n":null}'


def test_variant_contains_recursive(spark):
    def contains(hay, needle_json):
        needle = V.to_variant(F.lit(needle_json))
        return _one(spark, hay, V.variant_contains("v", needle))

    assert contains(JSON, "42") is True
    assert contains(JSON, '"s"') is True          # nested in c.x
    assert contains(JSON, "2") is True            # inside array b
    assert contains(JSON, "99") is False
    assert contains(JSON, '{"x": "s", "y": null}') is True   # whole sub-object
    assert contains(JSON, "true") is True
    # bool must not equal number 1 (IsEqual type discipline)
    assert contains('{"a": [1]}', "true") is False
    assert contains('{"a": [true]}', "1") is False
