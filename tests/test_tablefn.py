"""Table functions: repeat / repeat_row / query / query_table / read_blob.

Reference: src/function/table/repeat.cpp, repeat_row.cpp,
query_function.cpp, read_file.cpp.
"""

from __future__ import annotations

import pytest

from duckdb_spark.operators import tablefn as TF


def test_repeat_value_and_column_name(spark):
    df = TF.repeat(spark, "x", 4)
    assert df.columns == ["x"]
    assert df.count() == 4
    assert [r[0] for r in df.collect()] == ["x"] * 4
    assert TF.repeat(spark, 42, 0).count() == 0
    with pytest.raises(ValueError):
        TF.repeat(spark, 1, -1)


def test_repeat_row(spark):
    df = TF.repeat_row(spark, 1, "a", True, num_rows=3)
    assert df.columns == ["column0", "column1", "column2"]
    assert df.count() == 3
    assert df.collect()[0].asDict() == {"column0": 1, "column1": "a", "column2": True}
    with pytest.raises(ValueError, match="num_rows"):
        TF.repeat_row(spark, 1)
    with pytest.raises(ValueError, match="at least one column"):
        TF.repeat_row(spark, num_rows=2)


def test_query_and_query_table(spark):
    spark.range(3).createOrReplaceTempView("qt_a")
    spark.range(2).createOrReplaceTempView("qt_b")
    assert TF.query(spark, "SELECT 1 + 1 AS x;").collect()[0]["x"] == 2
    with pytest.raises(ValueError, match="SELECT"):
        TF.query(spark, "DROP TABLE qt_a")
    assert TF.query_table(spark, "qt_a").count() == 3
    assert TF.query_table(spark, ["qt_a", "qt_b"]).count() == 5
    assert TF.query_table(spark, ["qt_a", "qt_b"], by_name=True).count() == 5


def test_read_blob_and_text(spark, tmp_path):
    from duckdb_spark.io.readers import read_blob, read_text

    (tmp_path / "a.bin").write_bytes(b"\x00\x01binary")
    (tmp_path / "b.txt").write_text("hello")
    blobs = read_blob(spark, str(tmp_path) + "/*")
    assert set(blobs.columns) == {"filename", "content", "size", "last_modified"}
    rows = {r["filename"].rsplit("/", 1)[-1]: r for r in blobs.collect()}
    assert bytes(rows["a.bin"]["content"]) == b"\x00\x01binary"
    assert rows["b.txt"]["size"] == 5
    texts = read_text(spark, str(tmp_path) + "/b.txt")
    assert texts.collect()[0]["content"] == "hello"


def test_approx_top_k_sketch_bounds(spark):
    """Degraded regime: buckets < cardinality. The sketch must (a) bracket
    the exact count with [cnt_lo, cnt_hi], (b) still surface the true heavy
    hitter when it dominates (space-saving guarantee)."""
    from duckdb_spark.operators.sketch import approx_top_k_sketch

    import pyspark.sql.functions as F

    # 4 partitions; value 0 dominates (weight ~50%), long tail of 200 values
    df = (
        spark.range(0, 20000, 1, 4)
        .select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise((F.col("id") * 7919) % 200 + 1)
            .alias("v")
        )
    )
    got = approx_top_k_sketch(df, "v", k=3, buckets=16).collect()
    exact = {r["v"]: r["c"] for r in df.groupBy("v").agg(F.count("*").alias("c")).collect()}
    top = [r for r in got if r["rank"] == 1][0]
    assert top["value"] == 0
    for r in got:
        assert r["cnt_lo"] <= exact[r["value"]] <= r["cnt_hi"]


def test_udtf_sql_callable(spark):
    """Native UDTF (reference physical_tableinout_function.cpp): registered
    table-in/out functions callable from Connection.sql text, including the
    per-input-row LATERAL form."""
    from duckdb_spark.relation import Connection

    conn = Connection(spark=spark)
    out = conn.sql("SELECT * FROM tokenize_rows('a bb ccc') ORDER BY pos").fetchall()
    assert [(r[0], r[1]) for r in out] == [("a", 0), ("bb", 1), ("ccc", 2)]
    out2 = conn.sql("SELECT gram FROM ngram_rows('abcd', 2) ORDER BY pos").fetchall()
    assert [r[0] for r in out2] == ["ab", "bc", "cd"]
    # lateral: one udtf expansion per input row
    spark.createDataFrame([("x y",), ("z",)], "t string").createOrReplaceTempView("udtf_src")
    out3 = conn.sql(
        "SELECT t, token FROM udtf_src, LATERAL tokenize_rows(t) ORDER BY t, pos"
    ).fetchall()
    assert [(r[0], r[1]) for r in out3] == [("x y", "x"), ("x y", "y"), ("z", "z")]
    # custom registration via decorator
    from duckdb_spark.operators.udtf import register_udtf

    @register_udtf(spark, "double_rows", returnType="v bigint")
    class DoubleRows:
        def eval(self, n):
            yield (n,)
            yield (n * 2,)

    out4 = conn.sql("SELECT v FROM double_rows(21) ORDER BY v").fetchall()
    assert [r[0] for r in out4] == [21, 42]


def test_sniff_csv_and_lttb_sql_callable(spark, tmp_path):
    """sniff_csv() and lttb() resolve as FROM-position table functions in
    SQL text (VERDICT r08 item 8 — they existed only as Python operators)."""
    from duckdb_spark.relation import Connection

    conn = Connection(spark=spark)
    p = tmp_path / "s.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    row = conn.sql(f"SELECT * FROM sniff_csv('{p}')").fetchall()[0]
    assert row["Delimiter"] == "," and row["SkipRows"] == 0
    spark.sql(
        "SELECT CAST(id AS DOUBLE) AS x, CAST(id * id % 17 AS DOUBLE) AS y "
        "FROM range(100)"
    ).createOrReplaceTempView("lttb_pts")
    out = conn.sql("SELECT count(*) AS n FROM lttb(lttb_pts, x, y, 10)").fetchall()
    assert out[0][0] == 10


def test_uuid_family(spark):
    """uuidv4/uuidv7/uuid_extract_version/uuid_extract_timestamp registry
    names (reference random_functions.hpp; RFC 9562 v7 layout)."""
    from duckdb_spark.functions.registry import FUNCTIONS

    for n in ("uuidv4", "uuidv7", "uuid_extract_version",
              "uuid_extract_timestamp"):
        assert n in FUNCTIONS, n
    df = spark.range(1).select(
        FUNCTIONS["uuidv7"]().alias("u7"), FUNCTIONS["uuidv4"]().alias("u4")
    )
    r = df.select(
        "u7",
        FUNCTIONS["uuid_extract_version"]("u7").alias("v7"),
        FUNCTIONS["uuid_extract_version"]("u4").alias("v4"),
        FUNCTIONS["uuid_extract_timestamp"]("u7").alias("ts"),
    ).collect()[0]
    assert r.v7 == 7 and r.v4 == 4
    assert len(r.u7) == 36 and r.u7[14] == "7"
    import datetime
    assert abs((r.ts - datetime.datetime.now()).total_seconds()) < 3600
