"""DuckDB ↔ Spark type mapping (SURVEY.md §1.2).

The full `LogicalTypeId` surface (reference `src/include/duckdb/common/
types.hpp:193-258`) mapped to Spark SQL types, with documented emulations
where Spark lacks a native type. `duckdb_type_to_spark` accepts DuckDB
type *names* (as printed by `typeof()` / catalog DDL) including
parameterized DECIMAL(w,s) and nested LIST/STRUCT/MAP spellings.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T


class YMInterval(int):
    """A collected YEAR-MONTH interval: an int month count (so Arrow /
    toInternal round trips preserve the value) that PRINTS DuckDB-style
    (reference src/common/types/interval.cpp Interval::ToString)."""

    def __str__(self):
        months = int(self)
        sign = "-" if months < 0 else ""
        y, m = divmod(abs(months), 12)
        parts = []
        if y:
            parts.append(f"{sign}{y} year" + ("s" if y != 1 else ""))
        if m or not y:
            parts.append(f"{sign}{m} month" + ("s" if m != 1 else ""))
        return " ".join(parts)

    __repr__ = __str__


def _ym_interval_fromInternal(self, months):
    """PySpark leaves YearMonthIntervalType.fromInternal unimplemented, so
    collecting any `INTERVAL '1 year'` value raises. The internal value is
    a month count."""
    if months is None:
        return None
    return YMInterval(months)


def _ym_interval_toInternal(self, obj):
    if obj is None:
        return None
    if isinstance(obj, int):
        return int(obj)  # plain int: YMInterval must not reach the pickler
    months = 0
    for n, unit in re.findall(r"(-?\d+)\s*(year|month)", str(obj)):
        months += int(n) * (12 if unit == "year" else 1)
    return months


T.YearMonthIntervalType.fromInternal = _ym_interval_fromInternal
T.YearMonthIntervalType.toInternal = _ym_interval_toInternal
T.YearMonthIntervalType.needConversion = lambda self: True
# createDataFrame type verifier compares exact types — list every spelling
T._acceptable_types[T.YearMonthIntervalType] = (str, int, YMInterval)

# Simple name → Spark type (emulations noted; SURVEY §1.2 table).
_SIMPLE: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INTEGER": T.IntegerType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "UTINYINT": T.ShortType(),          # widen: no unsigned in Spark
    "USMALLINT": T.IntegerType(),
    "UINTEGER": T.LongType(),
    "UBIGINT": T.DecimalType(20, 0),
    "HUGEINT": T.DecimalType(38, 0),
    "UHUGEINT": T.DecimalType(38, 0),
    "FLOAT": T.FloatType(),
    "REAL": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "DOUBLE PRECISION": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "TEXT": T.StringType(),
    "STRING": T.StringType(),
    "BLOB": T.BinaryType(),
    "BYTEA": T.BinaryType(),
    "BIT": T.BinaryType(),              # bitstring emulated over binary
    "BITSTRING": T.BinaryType(),
    "DATE": T.DateType(),
    "TIME": T.LongType(),               # µs since midnight (no Spark TIME)
    "TIMETZ": T.LongType(),             # packed µs<<24 | offset (time_tz.hpp)
    "TIME WITH TIME ZONE": T.LongType(),
    "TIMESTAMP": T.TimestampNTZType(),  # DuckDB TIMESTAMP is tz-naive
    "DATETIME": T.TimestampNTZType(),
    "TIMESTAMP_S": T.TimestampNTZType(),
    "TIMESTAMP_MS": T.TimestampNTZType(),
    "TIMESTAMP_NS": T.TimestampNTZType(),  # ns truncated to µs (documented)
    "TIMESTAMPTZ": T.TimestampType(),
    "TIMESTAMP WITH TIME ZONE": T.TimestampType(),
    "INTERVAL": T.StructType(            # months/days/micros triple
        [
            T.StructField("months", T.IntegerType()),
            T.StructField("days", T.IntegerType()),
            T.StructField("micros", T.LongType()),
        ]
    ),
    "UUID": T.StringType(),             # canonical text form
    "JSON": T.StringType(),
    "ENUM": T.StringType(),             # + dictionary check at write
    "GEOMETRY": T.BinaryType(),         # WKB
    "BIGNUM": T.DecimalType(38, 0),
    "SQLNULL": T.NullType(),
    # postgres-style aliases (reference parser accepts all of these)
    "INT1": T.ByteType(),
    "INT2": T.ShortType(),
    "INT4": T.IntegerType(),
    "INT8": T.LongType(),
    # bit-width aliases (INT16/INT32/INT64), not byte-width (INT1/INT2/INT4/INT8)
    "UINT8": T.ShortType(),
    "UINT16": T.IntegerType(),
    "UINT32": T.LongType(),
    "UINT64": T.DecimalType(20, 0),
    "INT16": T.ShortType(),
    "INT32": T.IntegerType(),
    "INT64": T.LongType(),
    "SHORT": T.ShortType(),
    "LONG": T.LongType(),
    "INT128": T.DecimalType(38, 0),
    "SIGNED": T.LongType(),
    "FLOAT4": T.FloatType(),
    "FLOAT8": T.DoubleType(),
    "LOGICAL": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "OID": T.LongType(),
    "CHAR": T.StringType(),
    "BPCHAR": T.StringType(),
    "DECIMAL": T.DecimalType(18, 3),    # DuckDB default width/scale
    "NUMERIC": T.DecimalType(18, 3),
    "VARINT": T.DecimalType(38, 0),
}

_DECIMAL_RE = re.compile(r"(?i)^(?:DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$")
_CHAR_RE = re.compile(r"(?i)^(?:VARCHAR|CHAR|BPCHAR|STRING|TEXT)\s*\(\s*\d+\s*\)$")
_LIST_RE = re.compile(r"(?is)^(.*)\[\s*\d*\s*\]$")
_MAP_RE = re.compile(r"(?is)^MAP\s*\((.*),(.*)\)$")
_STRUCT_RE = re.compile(r"(?is)^(?:STRUCT|ROW)\s*\((.*)\)$")


def duckdb_type_to_spark(name: str) -> T.DataType:
    s = name.strip()
    if re.match(r"(?i)^ROW\s*\(", s):  # pg spelling of STRUCT
        s = "STRUCT" + s[s.index("("):]
    m = re.match(r"(?is)^TUPLE\s*\((.*)\)$", s)
    if m:
        # unnamed struct: TUPLE(T1, T2) ≡ STRUCT(col1 T1, col2 T2)
        # (reference types.hpp TUPLE alias; col-N is Spark's row naming)
        parts = _split_fields(m.group(1)) if m.group(1).strip() else []
        return T.StructType([
            T.StructField(f"col{i + 1}", duckdb_type_to_spark(p.strip()))
            for i, p in enumerate(parts)
        ])
    m = re.match(r"(?is)^(.*\S)\s+ARRAY$", s)  # SQL-standard `INT ARRAY`
    if m:
        return T.ArrayType(duckdb_type_to_spark(m.group(1)))
    m = re.match(r"(?is)^UNION\s*\((.*)\)$", s)
    if m:
        # DuckDB tagged UNION (union_casts.cpp): a single-member union
        # collapses to its member's carrier (the value IS the member —
        # cast/union_cast.test); multi-member unions ride a struct of the
        # members (inactive members NULL)
        parts = _split_fields(m.group(1))
        members = []
        for p in parts:
            p = p.strip()
            fname, ftype = p.split(" ", 1)
            members.append((fname.strip('"'), duckdb_type_to_spark(ftype)))
        if len(members) == 1:
            return members[0][1]
        # leading __dkutag names the active member (renderer shows only
        # that member's value, like the reference's union rendering)
        return T.StructType(
            [T.StructField("__dkutag", T.StringType())]
            + [T.StructField(n2, t2) for n2, t2 in members]
        )
    up = s.upper()
    if up in _SIMPLE:
        return _SIMPLE[up]
    m = _DECIMAL_RE.match(s)
    if m:
        # DuckDB permits precision 39-40 via hugeint storage; Spark caps at
        # 38 — clamp (values beyond 1e38 are out of scope per SURVEY §1.2)
        prec = min(38, int(m.group(1)))
        return T.DecimalType(prec, min(prec, int(m.group(2) or 0)))
    if _CHAR_RE.match(s):
        return T.StringType()
    m = _LIST_RE.match(s)
    if m:
        return T.ArrayType(duckdb_type_to_spark(m.group(1)))
    m = re.match(r"(?is)^MAP\s*\((.*)\)$", s)
    if m:
        # depth-aware key/value split: a greedy comma regex broke on
        # nested parenthesized types (MAP(VARCHAR, UNION(i INT, ...)) —
        # types/map/map_extract_nested_null.test)
        kv = _split_fields(m.group(1))
        if len(kv) == 2:
            return T.MapType(duckdb_type_to_spark(kv[0].strip()),
                             duckdb_type_to_spark(kv[1].strip()))
        return T.MapType(duckdb_type_to_spark(m.group(1).split(",")[0]),
                         T.StringType())
    m = _STRUCT_RE.match(s)
    if m:
        fields = []
        for part in _split_fields(m.group(1)):
            p = part.strip()
            # quoted names keep embedded spaces: "  test  " INTEGER
            mq = re.match(
                r'(?s)^(?:"((?:[^"]|"")*)"|`((?:[^`]|``)*)`)\s+(.*)$', p)
            if mq:
                fname = (mq.group(1).replace('""', '"') if mq.group(1)
                         is not None else mq.group(2).replace("``", "`"))
                ftype = mq.group(3)
            else:
                fname, ftype = p.split(" ", 1)
            fields.append(T.StructField(fname.strip('"'), duckdb_type_to_spark(ftype)))
        return T.StructType(fields)
    raise ValueError(f"unmapped DuckDB type: {name}")


def _split_fields(s: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p for p in parts if p.strip()]


def spark_type_to_duckdb(dt: T.DataType) -> str:
    """Inverse mapping (used by introspection/system tables)."""
    mapping = {
        T.BooleanType: "BOOLEAN", T.ByteType: "TINYINT", T.ShortType: "SMALLINT",
        T.IntegerType: "INTEGER", T.LongType: "BIGINT", T.FloatType: "FLOAT",
        T.DoubleType: "DOUBLE", T.StringType: "VARCHAR", T.BinaryType: "BLOB",
        T.DateType: "DATE", T.TimestampNTZType: "TIMESTAMP",
        T.TimestampType: "TIMESTAMP WITH TIME ZONE", T.NullType: "SQLNULL",
    }
    if type(dt) in mapping:
        return mapping[type(dt)]
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return spark_type_to_duckdb(dt.elementType) + "[]"
    if isinstance(dt, T.MapType):
        return f"MAP({spark_type_to_duckdb(dt.keyType)}, {spark_type_to_duckdb(dt.valueType)})"
    if isinstance(dt, T.StructType):
        names = [f.name for f in dt.fields]
        if not names:
            return "TUPLE"
        if names == [f"col{i + 1}" for i in range(len(names))]:
            # ROW(…) auto-naming: an unnamed struct is a TUPLE
            # (reference types.hpp TUPLE alias)
            inner = ", ".join(
                spark_type_to_duckdb(f.dataType) for f in dt.fields)
            return f"TUPLE({inner})"
        # field names quote ONLY when they need it (reference
        # KeywordHelper::WriteOptionallyQuoted; unnest_column_names:34
        # expects STRUCT(bbb INTEGER), not STRUCT("bbb" INTEGER))
        inner = ", ".join(
            (f.name if re.fullmatch(r"[a-z_][a-z0-9_]*", f.name)
             else f'"{f.name}"')
            + f" {spark_type_to_duckdb(f.dataType)}"
            for f in dt.fields)
        return f"STRUCT({inner})"
    return dt.simpleString().upper()


_DUCK_BASE_TYPES = {
    "boolean": "BOOLEAN", "tinyint": "TINYINT", "smallint": "SMALLINT",
    "int": "INTEGER", "integer": "INTEGER", "bigint": "BIGINT",
    "float": "FLOAT", "double": "DOUBLE", "string": "VARCHAR",
    "binary": "BLOB", "date": "DATE", "timestamp_ntz": "TIMESTAMP",
    "timestamp": "TIMESTAMP WITH TIME ZONE", "void": '"NULL"',
    "null": '"NULL"', "variant": "VARIANT",
}


def duck_type_text(s: str) -> str:
    """Spark simpleString type text → DuckDB type text (reference
    LogicalType::ToString; used by typeof()). Recursive descent over
    `array<…>`, `map<…,…>`, `struct<name:…, …>`, `decimal(p,s)`."""
    s = s.strip()

    def parse(i: int) -> tuple[str, int]:
        j = i
        while j < len(s) and (s[j].isalnum() or s[j] in "_ "):
            j += 1
        name = s[i:j].strip().lower()
        if j < len(s) and s[j] == "(":
            k = s.index(")", j)
            return f"{name.upper()}({s[j + 1:k]})", k + 1
        if name == "array" and j < len(s) and s[j] == "<":
            inner, k = parse(j + 1)
            return inner + "[]", k + 1  # past '>'
        if name == "map" and j < len(s) and s[j] == "<":
            kt, k = parse(j + 1)
            vt, k2 = parse(k + 1)  # past ','
            return f"MAP({kt}, {vt})", k2 + 1
        if name == "struct" and j < len(s) and s[j] == "<":
            fields = []
            names = []
            k = j + 1
            while s[k] != ">":
                c = s.index(":", k)
                fname = s[k:c].strip()
                ftype, k = parse(c + 1)
                names.append(fname)
                fields.append(f"{fname} {ftype}")
                if s[k] == ",":
                    k += 1
            if not names:
                return "TUPLE", k + 1
            if names == [f"col{n + 1}" for n in range(len(names))]:
                # ROW(…) auto-naming: an unnamed struct is a TUPLE
                # (reference types.hpp TUPLE alias)
                return "TUPLE(" + ", ".join(
                    f.split(" ", 1)[1] for f in fields) + ")", k + 1
            return "STRUCT(" + ", ".join(fields) + ")", k + 1
        return _DUCK_BASE_TYPES.get(name, name.upper()), j

    try:
        out, _ = parse(0)
        return out
    except Exception:  # malformed input: pass through
        return s


def spark_ddl(dtype: T.DataType) -> str:
    """DDL text for CAST(x AS <ddl>): like simpleString() but backticks
    field names that need quoting (spaces, punctuation) — simpleString
    drops the quoting and the parser then mangles the name."""
    if isinstance(dtype, T.ArrayType):
        return f"array<{spark_ddl(dtype.elementType)}>"
    if isinstance(dtype, T.MapType):
        return f"map<{spark_ddl(dtype.keyType)},{spark_ddl(dtype.valueType)}>"
    if isinstance(dtype, T.StructType):
        parts = []
        for f in dtype.fields:
            n = f.name
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n):
                n = "`" + n.replace("`", "``") + "`"
            parts.append(f"{n}:{spark_ddl(f.dataType)}")
        return "struct<" + ",".join(parts) + ">"
    return dtype.simpleString()
