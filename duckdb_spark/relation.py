"""DuckDB-style Relation / Connection facade over PySpark DataFrames.

Reference surface: the lazy Relation API in `src/main/relation.cpp`
(Project :32, Filter :79, Limit :104, Order :108, Join :132, Union :166,
Aggregate :186) and the 27 relation classes in `src/main/relation/`.
That API *is* the DataFrame model — each method here composes a lazy
`pyspark.sql.DataFrame`; nothing executes until an action
(`.df()`, `.fetchall()`, `.show()`).

String expressions (`rel.filter("l_quantity < 24")`) are delegated to
Spark SQL's expression parser (`F.expr`) — same contract as DuckDB's
string-expression forms, with Catalyst as the binder.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_spark.catalog import DEFAULT_SF_DIR, register_views
from duckdb_spark.session import get_spark


def _cols(exprs: Iterable[str | Column]) -> list[Column]:
    return [F.expr(e) if isinstance(e, str) else e for e in exprs]


def _split_top_level(s: str) -> list[str]:
    """Split an expression list on commas outside parens/brackets/quotes
    (so "round(sum(x), 2) AS r, g" → ["round(sum(x), 2) AS r", "g"])."""
    parts, depth, quote, start = [], 0, None, 0
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


class Relation:
    """Lazy relational node. Wraps a DataFrame; every method returns a new
    Relation (mirrors DuckDB Relation's shared-ptr composition)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- composition (reference: src/main/relation.cpp) ------------------
    def project(self, *exprs: str | Column) -> "Relation":
        return Relation(self._df.select(*_cols(exprs)))

    select = project

    def filter(self, cond: str | Column) -> "Relation":
        return Relation(self._df.filter(cond if isinstance(cond, Column) else F.expr(cond)))

    where = filter

    def aggregate(self, aggr: str, groups: str = "") -> "Relation":
        """DuckDB-style: rel.aggregate("sum(x) AS s, count(*) AS n", "g1, g2")."""
        agg_cols = _cols(_split_top_level(aggr)) if aggr else []
        if groups.strip():
            group_cols = _cols(_split_top_level(groups))
            return Relation(self._df.groupBy(*group_cols).agg(*agg_cols))
        return Relation(self._df.agg(*agg_cols))

    def order(self, *exprs: str | Column) -> "Relation":
        """ORDER BY with DuckDB string syntax: "col DESC", "expr ASC NULLS
        FIRST". DuckDB's default null order is NULLS LAST for ASC and NULLS
        FIRST for DESC (reference `default_null_order` setting) — applied
        here explicitly since Spark's bare default differs (NULLS FIRST asc).
        """
        cols = []
        for e in exprs:
            if not isinstance(e, str):
                cols.append(e)
                continue
            for part in _split_top_level(e):
                m = re.match(
                    r"(?is)^(.*?)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$", part
                )
                body, direction, nulls = m.group(1), (m.group(2) or "ASC").upper(), m.group(3)
                c = F.expr(body)
                if nulls is None:
                    nulls = "LAST" if direction == "ASC" else "FIRST"
                else:
                    nulls = nulls.upper()
                if direction == "ASC":
                    c = c.asc_nulls_first() if nulls == "FIRST" else c.asc_nulls_last()
                else:
                    c = c.desc_nulls_first() if nulls == "FIRST" else c.desc_nulls_last()
                cols.append(c)
        return Relation(self._df.orderBy(*cols))

    sort = order

    def limit(self, n: int, offset: int = 0) -> "Relation":
        if offset:
            return Relation(self._df.offset(offset).limit(n))
        return Relation(self._df.limit(n))

    def join(self, other: "Relation", condition: str | Column, how: str = "inner") -> "Relation":
        cond = condition if isinstance(condition, Column) else F.expr(condition)
        return Relation(self._df.join(other._df, cond, how))

    def cross(self, other: "Relation") -> "Relation":
        return Relation(self._df.crossJoin(other._df))

    def union(self, other: "Relation") -> "Relation":
        return Relation(self._df.unionAll(other._df))

    def union_by_name(self, other: "Relation") -> "Relation":
        return Relation(self._df.unionByName(other._df, allowMissingColumns=True))

    def intersect(self, other: "Relation") -> "Relation":
        # reference Relation::Intersect uses setop_all=true (INTERSECT ALL),
        # consistent with union/except_ here
        return Relation(self._df.intersectAll(other._df))

    def except_(self, other: "Relation") -> "Relation":
        return Relation(self._df.exceptAll(other._df))

    def distinct(self) -> "Relation":
        return Relation(self._df.distinct())

    def set_alias(self, alias: str) -> "Relation":
        return Relation(self._df.alias(alias))

    # -- execution --------------------------------------------------------
    def df(self) -> DataFrame:
        return self._df

    def fetchall(self):
        return self._df.collect()

    def fetchone(self):
        rows = self._df.take(1)
        return rows[0] if rows else None

    def to_pandas(self):
        return self._df.toPandas()

    def show(self, n: int = 20) -> None:
        self._df.show(n)

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode=mode)

    def count(self) -> int:
        return self._df.count()

    def create_view(self, name: str) -> "Relation":
        self._df.createOrReplaceTempView(name)
        return self

    @property
    def columns(self) -> list[str]:
        return self._df.columns


class Connection:
    """DuckDB-style connection: `con.sql(...)`, `con.read_parquet(...)`."""

    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        if sf_dir:
            register_views(self.spark, sf_dir)
        from duckdb_spark.sql.macros import MacroRegistry, PreparedStatements

        self.macros = MacroRegistry()
        self.prepared = PreparedStatements()
        from duckdb_spark.operators.udtf import register_builtin_udtfs

        register_builtin_udtfs(self.spark)

    def sql(self, query: str, params=None) -> "Relation | None":
        """Run DuckDB-dialect SQL: macro/sequence/PREPARE DDL handled by our
        catalog layer, `?`/`$n`/`$name` parameters bound as literals
        (reference client_context.cpp:535-579), everything else
        macro-expanded, dialect-translated (QUALIFY, DISTINCT ON, EXCLUDE,
        //, ::casts) and handed to Catalyst."""
        from duckdb_spark.sql.dialect import split_union_by_name, translate
        from duckdb_spark.sql.macros import bind_parameters

        if params is not None:
            query = bind_parameters(query, params)
        handled = self.prepared.handle(query)
        if handled is True:
            return None
        if isinstance(handled, str):
            query = handled
        if self.macros.handle_ddl(query):
            return None
        query = self.macros.expand(query)
        # LIMIT n% (reference physical_limit_percent.cpp): no Spark SQL
        # spelling — strip it and apply the two-pass relation operator
        m = re.match(
            r"(?is)^(.*)\bLIMIT\s+(.+?)\s*(?:%|\bPERCENT\b)"
            r"\s*(?:OFFSET\s+(.+?))?\s*;?\s*$",
            query,
        )
        if m:
            def _scalar(expr: str) -> float:
                if re.fullmatch(r"[\d\s()+\-*/.]+", expr):
                    return float(eval(expr, {"__builtins__": {}}))  # arithmetic
                if re.match(
                    r"(?is)^\s*(sum|count|avg|min|max|first|last|median|"
                    r"product)\s*\(", expr,
                ):
                    raise ValueError(
                        "Binder Error: Aggregate functions are not supported "
                        "in the LIMIT clause"
                    )
                # scalar expr / scalar subquery: evaluate driver-side; a
                # NULL percentage means "no limit" = 100%
                # (physical_limit_percent.cpp:75)
                v = self.spark.sql(translate(
                    f"SELECT CAST(({expr}) AS DOUBLE)")).collect()[0][0]
                return 100.0 if v is None else float(v)

            df = self.sql(m.group(1)).df()
            pct = _scalar(m.group(2))
            if pct < 0:
                raise ValueError(
                    "Out of Range Error: Limit percent out of range, "
                    "should be between 0% and 100%"
                )
            # reference physical_limit_percent.cpp:145: the row budget is
            # idx_t(pct/100 * count) over the PRE-offset count; OFFSET then
            # skips within that scan order
            n = df.count()
            k = int(_scalar(m.group(3))) if m.group(3) else 0
            return Relation(df.offset(k).limit(int(n * pct / 100.0)))
        ubn = split_union_by_name(query)
        if ubn:
            branches, ops, tail = ubn
            df = self.spark.sql(translate(branches[0]))
            for branch, op in zip(branches[1:], ops):
                df = df.unionByName(self.spark.sql(translate(branch)), allowMissingColumns=True)
                if op == "UNION":
                    df = df.distinct()
            if tail:
                df.createOrReplaceTempView("__union_by_name")
                df = self.spark.sql(f"SELECT * FROM __union_by_name {tail}")
            return Relation(df)
        try:
            return Relation(self.spark.sql(translate(query)))
        except Exception as e:
            # `s['field']` subscripts are type-ambiguous at translate time
            # (map key vs struct field); retry the struct reading when the
            # map reading fails analysis
            msg = str(e)
            if "element_at" in msg and (
                "UNEXPECTED_INPUT_TYPE" in msg or "MAP" in msg
            ):
                from duckdb_spark.sql.dialect import set_session_setting

                set_session_setting("__struct_subscript", "1")
                try:
                    return Relation(self.spark.sql(translate(query)))
                finally:
                    set_session_setting("__struct_subscript", "")
            # DuckDB allows SELECT-list aliases inside window expressions;
            # Spark doesn't. Retry with aliases inlined into window specs
            # (retry-only: columns must win over aliases when both resolve)
            if "LATERAL_COLUMN_ALIAS_IN_WINDOW" in msg:
                from duckdb_spark.sql.dialect import set_session_setting

                set_session_setting("__window_alias", "1")
                try:
                    return Relation(self.spark.sql(translate(query)))
                finally:
                    set_session_setting("__window_alias", "")
            raise

    query = sql
    execute = sql

    def table(self, name: str) -> Relation:
        return Relation(self.spark.table(name))

    def read_duckdb(self, db_path: str, table: str) -> Relation:
        from duckdb_spark.io.readers import read_duckdb

        return Relation(read_duckdb(self.spark, db_path, table))

    def export_database(self, out_dir: str, tables: list[str] | None = None) -> dict:
        from duckdb_spark.io.writers import export_database

        return export_database(self.spark, out_dir, tables)

    def import_database(self, in_dir: str) -> list[str]:
        from duckdb_spark.io.writers import import_database

        return import_database(self.spark, in_dir)

    def from_df(self, df: DataFrame) -> Relation:
        return Relation(df)

    def read_parquet(self, path: str, **options) -> Relation:
        return Relation(self.spark.read.options(**options).parquet(path))

    def read_csv(self, path: str, **options) -> Relation:
        from duckdb_spark.io.readers import read_csv

        return Relation(read_csv(self.spark, path, **options))

    def read_json(self, path: str, **options) -> Relation:
        from duckdb_spark.io.readers import read_json

        return Relation(read_json(self.spark, path, **options))

    def register(self, name: str, rel: "Relation | DataFrame") -> None:
        df = rel.df() if isinstance(rel, Relation) else rel
        df.createOrReplaceTempView(name)


def connect(sf_dir: str | None = None) -> Connection:
    return Connection(sf_dir=sf_dir)
