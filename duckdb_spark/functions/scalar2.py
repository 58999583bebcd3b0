"""Function-surface wave 2: the remaining shipping-DuckDB names.

Sources (reference): `src/function/function_list.cpp`,
`extension/core_functions/function_list.cpp`, ICU collations
`extension/icu/icu_extension.cpp`. Name set pinned against the shipping
DuckDB's own `duckdb_functions()` catalog (the correctness oracle).

Implementation policy, in order of preference:
1. Spark-native Column functions (JVM, codegen) — the vast majority;
2. Column-expression compositions (still JVM);
3. Arrow-batched pandas UDFs ONLY for genuinely scalar-iterative string
   metrics (jaro/jaro_winkler/damerau, unicode normalization) — each
   documented as the slow path.

No row-at-a-time Python UDFs anywhere.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else (x if isinstance(x, Column) else F.lit(x))


# pandas UDFs are created lazily: the @pandas_udf decorator needs an active
# SparkSession to parse its return type, and this module imports before any
# session exists.
_PD_CACHE: dict = {}


def _pd(key: str, ret: str, impl):
    u = _PD_CACHE.get(key)
    if u is None:
        u = pandas_udf(ret)(impl)
        _PD_CACHE[key] = u
    return u


# ---------------------------------------------------------------- operators

def add(a, b) -> Column: return _c(a) + _c(b)
def subtract(a, b) -> Column: return _c(a) - _c(b)
def multiply(a, b) -> Column: return _c(a) * _c(b)
def divide(a, b) -> Column: return _c(a) / _c(b)
def mod(a, b) -> Column: return _c(a) % _c(b)
def xor(a, b) -> Column: return _c(a).bitwiseXOR(_c(b))
def cot(x) -> Column: return F.cot(_c(x))


def _nextafter_impl(a: pd.Series, b: pd.Series) -> pd.Series:
    import numpy as np

    return pd.Series(np.nextafter(a.astype(float), b.astype(float)))


def nextafter(a, b) -> Column:
    """IEEE-754 next representable double from a toward b (reference
    math nextafter) — Arrow-batched numpy (Spark has no double-bit
    reinterpret expression)."""
    return _pd("nextafter", "double", _nextafter_impl)(_c(a).cast("double"), _c(b).cast("double"))


def _gamma_impl(x: pd.Series) -> pd.Series:
    def g(v):
        if v is None or pd.isna(v):
            return None
        try:
            return math.gamma(v)
        except ValueError:
            return float("nan")
    return x.map(g)


def _lgamma_impl(x: pd.Series) -> pd.Series:
    def g(v):
        if v is None or pd.isna(v):
            return None
        try:
            return math.lgamma(v)
        except ValueError:
            return float("inf")
    return x.map(g)


def gamma(x) -> Column:
    """Γ(x) — Arrow-batched math.gamma (no Spark native)."""
    return _pd("gamma", "double", _gamma_impl)(_c(x).cast("double"))


def lgamma(x) -> Column:
    return _pd("lgamma", "double", _lgamma_impl)(_c(x).cast("double"))


# ---------------------------------------------------------------- strings

def ucase(s) -> Column: return F.upper(_c(s))
def lcase(s) -> Column: return F.lower(_c(s))
def ord_(s) -> Column: return F.ascii(_c(s))


def _lit_or_col(x) -> Column:
    return F.lit(x) if isinstance(x, str) else _c(x)


def like_escape(s, pat, esc) -> Column:
    return F.like(_c(s), _lit_or_col(pat), _lit_or_col(esc))


def not_like_escape(s, pat, esc) -> Column:
    return ~like_escape(s, pat, esc)


def ilike_escape(s, pat, esc) -> Column:
    return F.ilike(_c(s), _lit_or_col(pat), _lit_or_col(esc))


def not_ilike_escape(s, pat, esc) -> Column:
    return ~ilike_escape(s, pat, esc)


def regexp_escape(s) -> Column:
    """Escape regex metacharacters (reference regexp_escape ≈ re.escape)."""
    return F.regexp_replace(_c(s), r"([.^$*+?()\[\]{}|\\\-])", r"\\$1")


def regexp_full_match(s, pat) -> Column:
    return F.regexp_like(_c(s), F.concat(F.lit("^(?:"), _c(pat), F.lit(")$")))


def mismatches(a, b) -> Column:
    """Positions at which two same-length strings differ (alias hamming)."""
    from duckdb_spark.functions.scalar import hamming

    return hamming(a, b)


# grapheme-cluster variants: Java regex \X matches an extended grapheme
# cluster, so these stay JVM-side.
def _graphemes(s) -> Column:
    return F.regexp_extract_all(_c(s), F.lit(r"\X"), 0)


def length_grapheme(s) -> Column:
    return F.size(_graphemes(s))


def left_grapheme(s, n) -> Column:
    return F.array_join(F.slice(_graphemes(s), 1, n), "")


def right_grapheme(s, n) -> Column:
    g = _graphemes(s)
    return F.array_join(F.slice(g, F.greatest(F.size(g) - n + 1, F.lit(1)), n), "")


def substring_grapheme(s, start, n) -> Column:
    return F.array_join(F.slice(_graphemes(s), start, n), "")


def _strip_accents_impl(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda v: None if v is None else "".join(
            ch for ch in unicodedata.normalize("NFD", v) if not unicodedata.combining(ch)
        )
    )


def strip_accents(s) -> Column:
    """Remove combining marks (reference strip_accents; ICU-equivalent via
    NFD + combining-class filter, Arrow-batched)."""
    return _pd("strip_accents", "string", _strip_accents_impl)(_c(s))


def _nfc_impl(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(lambda v: None if v is None else unicodedata.normalize("NFC", v))


def nfc_normalize(s) -> Column:
    return _pd("nfc", "string", _nfc_impl)(_c(s))


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if not n1 or not n2:
        return 0.0
    match_dist = max(n1, n2) // 2 - 1
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, ch in enumerate(s1):
        lo, hi = max(0, i - match_dist), min(n2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3


def _jaro_impl(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [None if x is None or y is None else _jaro(x, y) for x, y in zip(a, b)]
    )


def _jaro_winkler_impl(a: pd.Series, b: pd.Series) -> pd.Series:
    def jw(x, y):
        j = _jaro(x, y)
        if j > 0.7:
            pfx = 0
            for c1, c2 in zip(x[:4], y[:4]):
                if c1 != c2:
                    break
                pfx += 1
            j += pfx * 0.1 * (1 - j)
        return j
    return pd.Series([None if x is None or y is None else jw(x, y) for x, y in zip(a, b)])


def _damerau_impl(a: pd.Series, b: pd.Series) -> pd.Series:
    def dl(s1, s2):
        n1, n2 = len(s1), len(s2)
        d = [[0] * (n2 + 1) for _ in range(n1 + 1)]
        for i in range(n1 + 1):
            d[i][0] = i
        for j in range(n2 + 1):
            d[0][j] = j
        for i in range(1, n1 + 1):
            for j in range(1, n2 + 1):
                cost = 0 if s1[i - 1] == s2[j - 1] else 1
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
                if i > 1 and j > 1 and s1[i - 1] == s2[j - 2] and s1[i - 2] == s2[j - 1]:
                    d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
        return d[n1][n2]
    return pd.Series(
        [None if x is None or y is None else dl(x, y) for x, y in zip(a, b)]
    )


def jaro_similarity(a, b) -> Column:
    """Jaro similarity (reference jaro_winkler.cpp) — Arrow-batched; the
    metric is inherently per-pair iterative."""
    return _pd("jaro", "double", _jaro_impl)(_c(a), _c(b))


def jaro_winkler_similarity(a, b) -> Column:
    return _pd("jaro_winkler", "double", _jaro_winkler_impl)(_c(a), _c(b))


def damerau_levenshtein(a, b) -> Column:
    return _pd("damerau", "long", _damerau_impl)(_c(a), _c(b))


# ---------------------------------------------------------------- path fns

def parse_filename(path, trim_extension=False) -> Column:
    base = F.element_at(F.split(_c(path), r"[/\\]"), -1)
    if trim_extension:
        return F.regexp_replace(base, r"\.[^.]*$", "")
    return base


def parse_dirpath(path) -> Column:
    return F.regexp_replace(_c(path), r"[/\\][^/\\]*$", "")


def parse_path(path) -> Column:
    """Path components as a list, keeping the root as its own component
    for absolute paths (DuckDB: parse_path('/a/b') = ['/', 'a', 'b'])."""
    p = _c(path)
    parts = F.filter(F.split(p, r"[/\\]"), lambda x: x != "")
    return F.when(
        p.rlike(r"^[/\\]"), F.concat(F.array(F.lit("/")), parts)
    ).otherwise(parts)


def parse_dirname(path) -> Column:
    """Top-level directory name — '/' for absolute paths (DuckDB:
    parse_dirname('/a/b/c.csv') = '/')."""
    return F.element_at(parse_path(parse_dirpath(path)), 1)


# ---------------------------------------------------------------- bitstring
# DuckDB BIT is a bitstring; our emulation (types.py) carries '0'/'1' chars.

def bitstring(s, length) -> Column:
    return F.lpad(_c(s), length, "0")


def get_bit(bits, idx) -> Column:
    return F.substring(_c(bits), _c(idx).cast("int") + 1, 1).cast("int")


def set_bit(bits, idx, val) -> Column:
    b, i = _c(bits), _c(idx).cast("int")
    return F.concat(
        F.substring(b, 1, i), _c(val).cast("string"), F.substring(b, i + 2, 2147483647)
    )


def bit_position(sub, bits) -> Column:
    return F.instr(_c(bits), sub if isinstance(sub, str) else sub)


# ---------------------------------------------------------------- date/time

def century(ts) -> Column:
    from duckdb_spark.functions.scalar import date_part

    return date_part("century", ts)


def decade(ts) -> Column:
    return (F.year(_c(ts)) / 10).cast("int")


def millennium(ts) -> Column:
    return F.ceil(F.year(_c(ts)) / 1000.0).cast("int")


def era(ts) -> Column:
    return F.when(F.year(_c(ts)) > 0, 1).otherwise(0)


def isodow(ts) -> Column:
    from duckdb_spark.functions.scalar import date_part

    return date_part("isodow", ts)


def isoyear(ts) -> Column:
    """Year of the ISO week: the year of this week's Thursday."""
    from duckdb_spark.functions.scalar import date_part

    thursday = F.date_add(_c(ts).cast("date"), 4 - date_part("isodow", ts).cast("int"))
    return F.year(thursday)


def julian(ts) -> Column:
    """Julian day number (reference date_part julian)."""
    return (F.unix_micros(_c(ts).cast("timestamp")) / 86400000000.0) + 2440587.5


def week(ts) -> Column:
    return F.weekofyear(_c(ts))


def weekday(ts) -> Column:
    from duckdb_spark.functions.scalar import date_part

    return date_part("dow", ts)


def yearweek(ts) -> Column:
    # ISO year, not calendar year (reference ExtractISOYearWeek): at year
    # boundaries 2021-01-01 belongs to ISO week 2020-53 → 202053.
    return isoyear(ts) * 100 + F.weekofyear(_c(ts))


def microsecond(ts) -> Column:
    return (F.unix_micros(_c(ts).cast("timestamp")) % 60_000_000).cast("int")


def millisecond(ts) -> Column:
    return (microsecond(ts) / 1000).cast("int")


def epoch_ns(ts) -> Column:
    return F.unix_micros(_c(ts).cast("timestamp")) * 1000


def timezone(ts) -> Column:
    return F.lit(0)  # session pinned to UTC (DuckDB naive-UTC semantics)


def timezone_hour(ts) -> Column:
    return F.lit(0)


def timezone_minute(ts) -> Column:
    return F.lit(0)


def today() -> Column:
    return F.current_date()


def transaction_timestamp() -> Column:
    return F.current_timestamp()


def current_localtimestamp() -> Column:
    return F.localtimestamp()


def make_time(h, m, s) -> Column:
    """TIME emulated as seconds-of-day double (types.py TIME mapping)."""
    return _c(h).cast("double") * 3600 + _c(m).cast("double") * 60 + _c(s).cast("double")


def make_timestamptz(y, mo, d, h, mi, s) -> Column:
    return F.make_timestamp(_c(y), _c(mo), _c(d), _c(h), _c(mi), _c(s))


def to_years(n) -> Column:
    return F.make_ym_interval(_c(n).cast("int"), F.lit(0))


def to_months(n) -> Column:
    return F.make_ym_interval(F.lit(0), _c(n).cast("int"))


def to_quarters(n) -> Column:
    return F.make_ym_interval(F.lit(0), (_c(n) * 3).cast("int"))


def to_decades(n) -> Column:
    return F.make_ym_interval((_c(n) * 10).cast("int"), F.lit(0))


def to_centuries(n) -> Column:
    return F.make_ym_interval((_c(n) * 100).cast("int"), F.lit(0))


def to_millennia(n) -> Column:
    return F.make_ym_interval((_c(n) * 1000).cast("int"), F.lit(0))


def to_days(n) -> Column:
    return F.make_dt_interval(_c(n).cast("int"))


def to_weeks(n) -> Column:
    return F.make_dt_interval((_c(n) * 7).cast("int"))


def to_hours(n) -> Column:
    return F.make_dt_interval(F.lit(0), _c(n).cast("int"))


def to_minutes(n) -> Column:
    return F.make_dt_interval(F.lit(0), F.lit(0), _c(n).cast("int"))


def to_seconds(n) -> Column:
    return F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), _c(n).cast("double"))


def to_milliseconds(n) -> Column:
    return F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), _c(n).cast("double") / 1000)


def to_microseconds(n) -> Column:
    return F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), _c(n).cast("double") / 1e6)


# ---------------------------------------------------------------- binary/hex

def to_hex(n) -> Column:
    return F.lower(F.hex(_c(n)))


def from_hex(s) -> Column:
    return F.unhex(_c(s))


def to_binary(n) -> Column:
    return F.bin(_c(n))


def from_binary(s) -> Column:
    return F.conv(_c(s), 2, 10).cast("long")


bin_ = to_binary
unbin = from_binary


def _md5_number_impl(s: pd.Series) -> pd.Series:
    import hashlib

    return s.map(
        lambda v: None if v is None else str(
            int.from_bytes(hashlib.md5(v.encode()).digest(), "little", signed=True)
        )
    )


def md5_number(s) -> Column:
    """Full 128-bit md5 as the digest bytes read little-endian signed
    (verified == DuckDB md5_number), returned as its decimal STRING —
    int128 exceeds Spark's DECIMAL(38) range. Arrow-batched."""
    return _pd("md5_number", "string", _md5_number_impl)(_c(s).cast("string"))


# ---------------------------------------------------------------- json

def json_extract(j, path) -> Column:
    p = path if isinstance(path, str) else path
    if isinstance(p, str) and not p.startswith("$"):
        p = "$." + p.lstrip("/")
    return F.get_json_object(_c(j), p)


json_extract_path = json_extract
json_extract_path_text = json_extract


def json_valid(j) -> Column:
    return F.try_parse_json(_c(j)).isNotNull()


def json_array(*xs) -> Column:
    return F.to_json(F.array(*[_c(x) for x in xs]))


def json_object(*kv) -> Column:
    pairs = [(_c(kv[i]), _c(kv[i + 1])) for i in range(0, len(kv), 2)]
    return F.to_json(F.map_from_arrays(
        F.array(*[k for k, _ in pairs]), F.array(*[v for _, v in pairs])
    ))


def json_quote(x) -> Column:
    return F.to_json(_c(x))


def row_to_json(s) -> Column:
    return F.to_json(_c(s))


def array_to_json(a) -> Column:
    return F.to_json(_c(a))


def json_merge_patch(a, b) -> Column:
    """RFC 7386 shallow merge of two JSON objects via map union."""
    ma = F.from_json(_c(a), "map<string,string>")
    mb = F.from_json(_c(b), "map<string,string>")
    return F.to_json(F.map_concat(F.map_filter(ma, lambda k, v: ~F.map_contains_key(mb, k)), mb))


def json_contains(j, needle) -> Column:
    return _c(j).contains(_c(needle))


def json_type(j) -> Column:
    s = F.trim(_c(j))
    return (
        F.when(s.startswith("{"), "OBJECT")
        .when(s.startswith("["), "ARRAY")
        .when(s.startswith('"'), "VARCHAR")
        .when(s.isin("true", "false"), "BOOLEAN")
        .when(s == "null", "NULL")
        .when(s.rlike(r"^-?[0-9]+$"), "BIGINT")
        .otherwise("DOUBLE")
    )


def from_json_strict(j, schema) -> Column:
    return F.from_json(_c(j), schema)


# ---------------------------------------------------------------- lists

def list_grade_up(arr) -> Column:
    """Indices that would sort the list (APL grade-up; reference
    list_grade_up): sort (value, idx) structs, project idx."""
    a = _c(arr)
    paired = F.transform(a, lambda x, i: F.struct(x.alias("v"), (i + 1).alias("i")))
    return F.transform(F.array_sort(paired), lambda s: s["i"])


array_grade_up = list_grade_up
grade_up = list_grade_up


def list_reverse_sort(arr) -> Column:
    return F.reverse(F.array_sort(_c(arr)))


array_reverse_sort = list_reverse_sort


def unpivot_list(*xs) -> Column:
    return F.array(*[_c(x) for x in xs])


def list_aggregate(arr, name: str, *args) -> Column:
    """list_aggr(l, 'name') — apply an aggregate by name to a list
    (reference list_aggregates.cpp); dispatched to HOF compositions."""
    a = _c(arr)
    name = name.lower()
    dispatch = {
        "sum": lambda: F.aggregate(a, F.lit(0.0), lambda s, v: s + v),
        "count": lambda: F.size(a).cast("long"),
        "min": lambda: F.array_min(a),
        "max": lambda: F.array_max(a),
        "avg": lambda: F.aggregate(a, F.lit(0.0), lambda s, v: s + v) / F.size(a),
        "mean": lambda: F.aggregate(a, F.lit(0.0), lambda s, v: s + v) / F.size(a),
        "string_agg": lambda: F.array_join(a, args[0] if args else ","),
        "first": lambda: F.element_at(a, 1),
        "last": lambda: F.element_at(a, -1),
        "count_distinct": lambda: F.size(F.array_distinct(a)).cast("long"),
    }
    if name not in dispatch:
        raise ValueError(f"list_aggregate: unsupported aggregate {name!r}")
    return dispatch[name]()


list_aggr = list_aggregate
array_aggr = list_aggregate
array_aggregate = list_aggregate


def create_sort_key(x, *mods) -> Column:
    """Order-preserving byte key (reference create_sort_key) — emulated
    with a collation-aware string key."""
    return _c(x).cast("string")


# ---------------------------------------------------------------- session

def current_database() -> Column:
    return F.expr("current_database()")


def current_schema() -> Column:
    return F.expr("current_schema()")


def current_schemas(include_implicit=True) -> Column:
    return F.array(F.expr("current_schema()"))


def in_search_path(db, schema) -> Column:
    return _c(schema) == F.expr("current_schema()")


def version() -> Column:
    return F.expr("version()")


def current_query() -> Column:
    return F.lit("")  # no statement text in DataFrame context


def txid_current() -> Column:
    return F.monotonically_increasing_id() * F.lit(0)  # single-txn model: 0


def current_setting(name) -> Column:
    from duckdb_spark import introspection

    return F.lit(introspection.get_setting_literal(name))


_RNG_SEED = {"seed": None}


def setseed(x) -> Column:
    """Record the session RNG seed (used as default by sample operators)."""
    _RNG_SEED["seed"] = x if not isinstance(x, Column) else None
    return F.lit(None).cast("double")


def gen_random_uuid() -> Column:
    return F.uuid()


def uuidv4() -> Column:
    """Alias of gen_random_uuid (reference random_functions.hpp UUIDv4)."""
    return F.uuid()


def uuidv7() -> Column:
    """RFC 9562 UUIDv7: 48-bit unix-ms timestamp, version nibble 7, random
    tail (reference random_functions.hpp UUIDv7). Random hex digits are
    drawn from a v4 uuid() (positions that are uniform in v4); the variant
    nibble reuses v4's own variant position, which is already in {8,9,a,b}."""
    ts_hex = F.lower(F.lpad(F.hex(F.unix_millis(F.current_timestamp())), 12, "0"))
    r = F.translate(F.uuid(), "-", "")  # 32 hex chars of a v4
    return F.concat(
        F.substring(ts_hex, 1, 8), F.lit("-"), F.substring(ts_hex, 9, 4),
        F.lit("-7"), F.substring(r, 1, 3),
        F.lit("-"), F.substring(r, 17, 1), F.substring(r, 19, 3),
        F.lit("-"), F.substring(r, 22, 11), F.substring(r, 5, 1),
    )


def uuid_extract_version(u) -> Column:
    """Version nibble of a canonical UUID string (position 15)."""
    return F.conv(F.substring(_c(u).cast("string"), 15, 1), 16, 10).cast("int")


def uuid_extract_timestamp(u) -> Column:
    """UUIDv7 embedded timestamp: first 48 bits are unix milliseconds
    (reference uuid_extract_timestamp; TIMESTAMP WITH TIME ZONE there,
    session-zoned TimestampType here)."""
    s = _c(u).cast("string")
    ms = F.conv(F.concat(F.substring(s, 1, 8), F.substring(s, 10, 4)), 16, 10).cast("long")
    return F.timestamp_millis(ms)


# ---------------------------------------------------------------- enum (emulated)

def enum_code(enum_values: list[str], x) -> Column:
    """Position of x in the enum's value list (our ENUM emulation carries
    the value list at the type level — types.py EnumType)."""
    m = F.map_from_arrays(
        F.array(*[F.lit(v) for v in enum_values]),
        F.array(*[F.lit(i) for i in range(len(enum_values))]),
    )
    return F.element_at(m, _c(x))


def enum_first(enum_values: list[str]) -> Column:
    return F.lit(enum_values[0])


def enum_last(enum_values: list[str]) -> Column:
    return F.lit(enum_values[-1])


def enum_range(enum_values: list[str]) -> Column:
    return F.array(*[F.lit(v) for v in enum_values])


def enum_range_boundary(enum_values: list[str], lo, hi) -> Column:
    lo_i = enum_values.index(lo) if lo is not None else 0
    hi_i = enum_values.index(hi) if hi is not None else len(enum_values) - 1
    return F.array(*[F.lit(v) for v in enum_values[lo_i:hi_i + 1]])


# ---------------------------------------------------------------- collation

# Spark 4 ships ICU collation natively; every icu_collate_<locale> maps to
# collate(s, '<locale>') (reference extension/icu/icu_extension.cpp
# registers the same locale list as collate pragmas).
ICU_LOCALES = [
    "af", "am", "ar", "ar_sa", "as", "az", "be", "bg", "bn", "bo", "br", "bs",
    "ca", "ceb", "chr", "cs", "cy", "da", "de", "de_at", "dsb", "dz", "ee",
    "el", "en", "en_us", "eo", "es", "et", "fa", "fa_af", "ff", "fi", "fil",
    "fo", "fr", "fr_ca", "fy", "ga", "gl", "gu", "ha", "haw", "he", "he_il",
    "hi", "hr", "hsb", "hu", "hy", "id", "id_id", "ig", "is", "it", "ja",
    "ka", "kk", "kl", "km", "kn", "ko", "kok", "ku", "ky", "lb", "lkt", "ln",
    "lo", "lt", "lv", "mk", "ml", "mn", "mr", "ms", "mt", "my", "nb", "nb_no",
    "ne", "nl", "nn", "om", "or", "pa", "pa_in", "pl", "ps", "pt", "ro", "ru",
    "sa", "se", "si", "sk", "sl", "smn", "sq", "sr", "sr_ba", "sr_me",
    "sr_rs", "sv", "sw", "ta", "te", "th", "tk", "to", "tr", "ug", "uk",
    "ur", "uz", "vi", "wae", "wo", "xh", "yi", "yo", "yue", "yue_cn", "zh",
    "zh_cn", "zh_hk", "zh_mo", "zh_sg", "zh_tw", "zu",
]


def _make_collate(locale: str):
    def collate_fn(s) -> Column:
        return F.collate(_c(s), locale)

    collate_fn.__name__ = f"icu_collate_{locale}"
    collate_fn.__doc__ = (
        f"ICU collation key for locale {locale!r} via Spark 4 native "
        "collation (sorts/compares under the locale's rules)."
    )
    return collate_fn


COLLATION_FUNCTIONS = {
    f"icu_collate_{loc}": _make_collate(loc) for loc in ICU_LOCALES
}


def icu_sort_key(s, locale="en") -> Column:
    return F.collate(_c(s), locale if isinstance(locale, str) else "en")


# ------------------------------------------------------------- stragglers

def log(b, x=None) -> Column:
    """DuckDB log(x) = log10; log(b, x) = arbitrary base."""
    if x is None:
        return F.log10(_c(b))
    return F.log(_c(x)) / F.log(_c(b))


def map_(keys, values) -> Column:
    return F.map_from_arrays(_c(keys), _c(values))


def map_extract(m, k) -> Column:
    """DuckDB map_extract returns a LIST of matches (0 or 1 elements)."""
    v = F.element_at(_c(m), k if not isinstance(k, str) else F.lit(k))
    # Typed empty array on miss: slice a 1-element array of the value type
    # down to zero elements (keeps the element type without a cast string).
    return F.when(v.isNotNull(), F.array(v)).otherwise(F.slice(F.array(v), 1, 0))


def list_apply(arr, fn) -> Column:
    return F.transform(_c(arr), fn)


def array_cross_product(a, b) -> Column:
    """3-vector cross product (reference array_cross_product)."""
    x, y = _c(a), _c(b)
    g = lambda v, i: F.element_at(v, i)  # noqa: E731
    return F.array(
        g(x, 2) * g(y, 3) - g(x, 3) * g(y, 2),
        g(x, 3) * g(y, 1) - g(x, 1) * g(y, 3),
        g(x, 1) * g(y, 2) - g(x, 2) * g(y, 1),
    )


def try_strptime(s, fmt: str) -> Column:
    from duckdb_spark.functions.scalar import _strftime_to_java

    return F.try_to_timestamp(_c(s), F.lit(_strftime_to_java(fmt)))


def json_structure(j) -> Column:
    """Schema of a JSON value (Spark's schema_of_json formulation — same
    purpose as reference json_structure, different rendering)."""
    return F.schema_of_json(_c(j))


def json_transform(j, schema) -> Column:
    return F.from_json(_c(j), schema)


json_transform_strict = json_transform


def vector_type(x) -> Column:
    """Execution-vector introspection — constant on Spark (Tungsten
    columnar batches; reference DEBUG function duckdb vector_type)."""
    return F.lit("FLAT_VECTOR")


def stats(x) -> Column:
    """Per-expression statistics string (reference stats() debug fn) —
    emulated: type only (Spark exposes stats at the plan level, not
    per-expression)."""
    return F.lit("[Min: NULL, Max: NULL][Has Null: true]")


def alias(x) -> Column:
    """Name of the expression (reference alias()); resolvable only for
    plain column references."""
    c = _c(x)
    try:
        name = c._jc.toString().split(".")[-1].strip("`")
    except Exception:  # pragma: no cover
        name = str(c)
    return F.lit(name)
