"""Writable managed tables for `Connection.sql` DML (reference
`src/execution/operator/persistent/physical_insert.cpp`,
`physical_delete.cpp`, `physical_update.cpp`).

Spark-idiomatic storage — a managed table is an *external parquet table*
registered in the session catalog at an explicit /tmp location:

- **CREATE TABLE** registers the schema (`spark.catalog.createTable`);
  an empty directory is a valid 0-row table because the schema lives in
  the catalog.
- **INSERT INTO** passes through to Catalyst's native `InsertIntoTable`
  over the external parquet source — executor-parallel file appends, no
  driver-side row handling; this is the 100 TB path.
- **UPDATE / DELETE** are copy-on-write: survivors (or updated rows) are
  written to a fresh version directory and the table is re-pointed —
  Delta/Iceberg semantics without the transaction log (single-writer
  sessions; MVCC is documented out of scope, SURVEY §2.10). The rewrite
  is a distributed scan→filter/project→write, never a collect.

The sqllogictest harness keeps its own driver-side row store
(`sqllogic.SLSession`) because its tables are tiny and its statements run
thousands of times; this module is the scale path for real users.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CREATE_RE = re.compile(
    r"(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?TABLE\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?([\w.\"]+)\s*(.*?)\s*;?\s*$"
)
_DROP_RE = re.compile(
    r"(?is)^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.\"]+)\s*;?\s*$"
)
_INSERT_RE = re.compile(
    r"(?is)^\s*INSERT\s+INTO\s+([\w.\"]+)\s*(\([^)]*\))?\s*(.*?)\s*;?\s*$"
)
_DELETE_RE = re.compile(
    r"(?is)^\s*DELETE\s+FROM\s+([\w.\"]+)"
    r"(?:\s+WHERE\s+(.*?))?(?:\s+RETURNING\s+(.+?))?\s*;?\s*$"
)
_UPDATE_RE = re.compile(
    r"(?is)^\s*UPDATE\s+([\w.\"]+)\s+SET\s+(.*?)"
    r"(?:\s+WHERE\s+(.*?))?(?:\s+RETURNING\s+(.+?))?\s*;?\s*$"
)
_TRUNCATE_RE = re.compile(
    r"(?is)^\s*TRUNCATE\s+(?:TABLE\s+)?([\w.\"]+)\s*;?\s*$"
)
_MERGE_RE = re.compile(
    r"(?is)^\s*MERGE\s+INTO\s+([\w.\"]+)(?:\s+(?:AS\s+)?(\w+))?\s+"
    r"USING\s+(.+?)(?:\s+(?:AS\s+)?(\w+))?\s+ON\s+(.+?)\s*"
    r"((?:WHEN\s+(?:NOT\s+)?MATCHED\b.*?)+)\s*;?\s*$"
)
_WHEN_RE = re.compile(
    r"(?is)WHEN\s+(NOT\s+)?MATCHED\s*(?:AND\s+(.+?))?\s*THEN\s+"
    r"(UPDATE\s+SET\s+.+?|DELETE|INSERT\s*(?:\*|\([^)]*\)\s*VALUES\s*\(.+?\)"
    r"|VALUES\s*\(.+?\))?)\s*(?=WHEN\s+(?:NOT\s+)?MATCHED|$)"
)


def _flat(name: str) -> str:
    return name.strip().strip('"').split(".")[-1].lower()


def _split_coldefs(body: str) -> list[str]:
    """Split a column-definition list on top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


class ManagedTables:
    """Per-connection registry of external-parquet writable tables."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.base = tempfile.mkdtemp(prefix="duckdb_spark_tables_")
        # name -> (schema, current version int)
        self.tables: dict[str, tuple] = {}

    # -- storage ----------------------------------------------------------

    def _loc(self, name: str, version: int) -> str:
        return os.path.join(self.base, name, f"v{version}")

    def _point(self, name: str, schema, version: int) -> None:
        """(Re-)register `name` as an external parquet table at vN."""
        loc = self._loc(name, version)
        os.makedirs(loc, exist_ok=True)
        self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        self.spark.catalog.createTable(
            name, path=loc, source="parquet", schema=schema
        )
        self.tables[name] = (schema, version)

    def _rewrite(self, name: str, df: DataFrame) -> None:
        """Copy-on-write: write `df` to the next version dir, re-point."""
        schema, version = self.tables[name]
        df.write.mode("overwrite").parquet(self._loc(name, version + 1))
        self._point(name, schema, version + 1)

    def df(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # -- statement handlers ------------------------------------------------

    def handle(self, con, query: str):
        """Try to execute `query` as managed-table DDL/DML. Returns
        False when the statement is not ours; a Relation/None when done."""
        from duckdb_spark.relation import Relation

        m = _CREATE_RE.match(query)
        if m and (m.group(4) or "").strip():
            return self._create(con, m)
        m = _DROP_RE.match(query)
        if m:
            name = _flat(m.group(2))
            if name not in self.tables:
                if m.group(1):
                    return None
                return False  # let view/other DROP paths run
            self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
            del self.tables[name]
            return None
        m = _TRUNCATE_RE.match(query)
        if m and _flat(m.group(1)) in self.tables:
            name = _flat(m.group(1))
            schema, version = self.tables[name]
            self._point(name, schema, version + 1)
            return None
        m = _INSERT_RE.match(query)
        if m and _flat(m.group(1)) in self.tables:
            return self._insert(con, m)
        m = _DELETE_RE.match(query)
        if m and _flat(m.group(1)) in self.tables:
            return self._delete(con, m)
        m = _UPDATE_RE.match(query)
        if m and _flat(m.group(1)) in self.tables:
            return self._update(con, m)
        m = _MERGE_RE.match(query)
        if m and _flat(m.group(1)) in self.tables:
            return self._merge(con, m)
        return False

    def _merge(self, con, m: re.Match):
        """MERGE INTO target USING source ON cond WHEN ... — post-image via
        operators/dml.merge_into's three-branch plan (anti ∪ updated ∪
        inserts; one shuffle on the join keys), then a copy-on-write
        rewrite. Reference src/execution/operator/persistent/
        physical_merge_into.cpp."""
        from duckdb_spark.sql.dialect import translate

        name = _flat(m.group(1))
        t_alias = m.group(2) or name
        schema, _ = self.tables[name]
        src_sql = m.group(3).strip()
        s_alias = m.group(4) or "__src"
        if src_sql.startswith("("):
            src = con.sql(src_sql[1:src_sql.rfind(")")]).df()
        else:
            src = self.spark.table(_flat(src_sql))
        cond = m.group(5)
        tcols = [f.name for f in schema.fields]

        t = self.spark.table(name).alias(t_alias)
        s = src.alias(s_alias)
        on = F.expr(cond)
        matched = t.join(s, on, "inner")
        unmatched = t.join(s, on, "left_anti").select(
            *[F.col(c) for c in tcols])
        inserts_src = s.join(t, on, "left_anti")

        matched_out = None
        insert_out = None
        n_affected = 0
        for w in _WHEN_RE.finditer(m.group(6)):
            is_not, wcond, action = bool(w.group(1)), w.group(2), w.group(3)
            if not is_not:
                n_affected += (matched.filter(F.expr(wcond)).count()
                               if wcond else matched.count())
                if re.match(r"(?is)^DELETE$", action.strip()):
                    keep = matched.filter(~F.coalesce(
                        F.expr(wcond), F.lit(False))) if wcond \
                        else matched.limit(0)
                    matched_out = keep.select(
                        *[F.col(f"{t_alias}.{c}").alias(c) for c in tcols])
                else:
                    sets = {}
                    body = re.sub(r"(?is)^UPDATE\s+SET\s+", "",
                                  action.strip())
                    for part in _split_coldefs(body):
                        sm = re.match(r'(?s)^\s*("([^"]+)"|\w+)\s*=\s*(.*)$',
                                      part)
                        sets[(sm.group(2) or sm.group(1)).lower()] = \
                            sm.group(3).strip()
                    upd = matched.filter(F.expr(wcond)) if wcond else matched
                    rest = matched.filter(~F.coalesce(
                        F.expr(wcond), F.lit(False))) if wcond \
                        else matched.limit(0)
                    matched_out = upd.select(*[
                        (F.expr(sets[c.lower()]) if c.lower() in sets
                         else F.col(f"{t_alias}.{c}")).cast(
                             dict(t.dtypes)[c]).alias(c)
                        for c in tcols
                    ]).unionByName(rest.select(
                        *[F.col(f"{t_alias}.{c}").alias(c) for c in tcols]))
            else:
                act = action.strip() if action else "INSERT *"
                vm = re.match(
                    r"(?is)^INSERT\s*(?:\(([^)]*)\))?\s*VALUES\s*\((.+)\)$",
                    act)
                if vm:
                    cols = ([c.strip().strip('"') for c in
                             vm.group(1).split(",")] if vm.group(1)
                            else tcols)
                    vals = _split_coldefs(vm.group(2))
                    vmap = dict(zip([c.lower() for c in cols], vals))
                    insert_out = inserts_src.select(*[
                        (F.expr(vmap[c.lower()]) if c.lower() in vmap
                         else F.lit(None)).cast(dict(t.dtypes)[c]).alias(c)
                        for c in tcols
                    ])
                else:  # INSERT *
                    insert_out = inserts_src.select(*[
                        (F.col(c) if c in inserts_src.columns
                         else F.lit(None)).cast(dict(t.dtypes)[c]).alias(c)
                        for c in tcols
                    ])
        if matched_out is None:
            matched_out = matched.select(
                *[F.col(f"{t_alias}.{c}").alias(c) for c in tcols])
        out = unmatched.unionByName(matched_out)
        if insert_out is not None:
            n_affected += insert_out.count()
            out = out.unionByName(insert_out)
        self._rewrite(name, out)
        return self._count(n_affected)

    def _create(self, con, m: re.Match):
        replace, if_not_exists = bool(m.group(1)), bool(m.group(2))
        name, body = _flat(m.group(3)), m.group(4).strip()
        if name in self.tables:
            if if_not_exists:
                return None
            if not replace:
                raise ValueError(
                    f'Catalog Error: Table with name "{name}" already exists!'
                )
        as_m = re.match(r"(?is)^(?:\([^()]*\)\s*)?AS\s+(.*)$", body)
        if as_m:  # CTAS: evaluate through the dialect layer, then write v0
            df = con.sql(as_m.group(1)).df()
            loc = self._loc(name, 0)
            df.write.mode("overwrite").parquet(loc)
            self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
            self.spark.catalog.createTable(name, path=loc, source="parquet")
            self.tables[name] = (self.spark.table(name).schema, 0)
            return None
        if not body.startswith("("):
            return False
        from pyspark.sql import types as T

        from duckdb_spark.sql.dialect import expand_type_aliases
        from duckdb_spark.types import duckdb_type_to_spark

        inner = body[1:body.rfind(")")]
        fields = []
        for coldef in _split_coldefs(inner):
            if re.match(r"(?i)^(primary|unique|check|foreign|constraint)\b",
                        coldef):
                continue
            mm = re.match(r'(?s)^("([^"]+)"|\S+)\s+(.*)$', coldef)
            if mm is None:
                raise ValueError(f"unparseable column def {coldef!r}")
            cname = mm.group(2) or mm.group(1)
            ctype = re.sub(
                r"(?i)\s+(primary\s+key|not\s+null|unique|default\s+.*"
                r"|check\s*\(.*|collate\s+\S+)",
                "", mm.group(3)).strip()
            fields.append(T.StructField(
                cname, duckdb_type_to_spark(expand_type_aliases(ctype))
            ))
        self._point(name, T.StructType(fields), 0)
        return None

    def _insert(self, con, m: re.Match):
        from duckdb_spark.relation import Relation

        name = _flat(m.group(1))
        schema, _ = self.tables[name]
        cols = (
            [c.strip().strip('"') for c in m.group(2)[1:-1].split(",")]
            if m.group(2) else [f.name for f in schema.fields]
        )
        src_sql = m.group(3).strip()
        ret = None
        rm = re.search(r"(?is)\bRETURNING\s+(.+)$", src_sql)
        if rm:
            ret, src_sql = rm.group(1).strip(), src_sql[: rm.start()].strip()
        src = con.sql(
            src_sql if not src_sql.upper().startswith("VALUES")
            else "SELECT * FROM (" + src_sql + "\n)"
        ).df()
        if len(src.columns) != len(cols):
            raise ValueError(
                "Binder Error: INSERT column count mismatch"
            )
        by_name = dict(zip(cols, src.columns))
        aligned = src.select(*[
            (F.col(by_name[f.name]).cast(f.dataType) if f.name in by_name
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in schema.fields
        ])
        # Native executor-parallel file append — never a collect.
        aligned.write.mode("append").insertInto(name)
        self.spark.catalog.refreshTable(name)
        if ret:
            from duckdb_spark.sql.dialect import translate

            aligned.createOrReplaceTempView("__managed_returning")
            return Relation(self.spark.sql(translate(
                f"SELECT {ret} FROM __managed_returning")))
        return self._count(aligned.count())

    def _delete(self, con, m: re.Match):
        from duckdb_spark.relation import Relation
        from duckdb_spark.sql.dialect import translate

        name = _flat(m.group(1))
        before = self.spark.table(name).count()
        if m.group(2):
            keep = self.spark.sql(translate(
                f"SELECT * FROM {name} "
                f"WHERE NOT COALESCE(({m.group(2)}), FALSE)"))
            removed = None
            if m.group(3):
                removed = self.spark.sql(translate(
                    f"SELECT {m.group(3)} FROM {name} "
                    f"WHERE COALESCE(({m.group(2)}), FALSE)")).collect()
            self._rewrite(name, keep)
            after = self.spark.table(name).count()
            if m.group(3):
                return Relation(self.spark.createDataFrame(
                    removed, self.spark.sql(translate(
                        f"SELECT {m.group(3)} FROM {name}")).schema))
            return self._count(before - after)
        schema, version = self.tables[name]
        self._point(name, schema, version + 1)
        return self._count(before)

    def _update(self, con, m: re.Match):
        from duckdb_spark.relation import Relation
        from duckdb_spark.sql.dialect import translate

        name = _flat(m.group(1))
        schema, _ = self.tables[name]
        sets = {}
        for part in _split_coldefs(m.group(2)):
            sm = re.match(r'(?s)^\s*("([^"]+)"|\w+)\s*=\s*(.*)$', part)
            if not sm:
                raise ValueError(f"unparseable SET clause {part!r}")
            sets[(sm.group(2) or sm.group(1)).lower()] = sm.group(3).strip()
        cond = m.group(3) or "TRUE"
        proj = ", ".join(
            f"CASE WHEN COALESCE(({cond}), FALSE) THEN ({sets[f.name.lower()]}) "
            f"ELSE `{f.name}` END AS `{f.name}`"
            if f.name.lower() in sets else f"`{f.name}`"
            for f in schema.fields
        )
        updated = self.spark.sql(translate(f"SELECT {proj} FROM {name}"))
        n = self.spark.sql(translate(
            f"SELECT COUNT(*) FROM {name} "
            f"WHERE COALESCE(({cond}), FALSE)")).collect()[0][0]
        ret_rows = None
        if m.group(4):
            ret_rows = self.spark.sql(translate(
                f"SELECT {m.group(4)} FROM (SELECT {proj} FROM {name} "
                f"WHERE COALESCE(({cond}), FALSE))")).collect()
        self._rewrite(name, updated.select(*[f.name for f in schema.fields])
                      .selectExpr(*[
                          f"CAST(`{f.name}` AS {f.dataType.simpleString()}) "
                          f"AS `{f.name}`" for f in schema.fields]))
        if m.group(4):
            from duckdb_spark.relation import Relation as R

            return R(self.spark.createDataFrame(
                ret_rows, self.spark.sql(translate(
                    f"SELECT {m.group(4)} FROM {name} WHERE 1=0")).schema))
        return self._count(n)

    def _count(self, n: int):
        from duckdb_spark.relation import Relation

        return Relation(self.spark.createDataFrame([(n,)], "Count: bigint"))
