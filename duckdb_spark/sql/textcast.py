"""Constant VARCHAR → nested-type cast folding.

DuckDB casts strings to LIST/STRUCT/MAP at runtime with its own text
grammar (src/function/cast/string_cast.cpp + vector_string_cast): bare or
quoted elements, backslash escapes, `{k: v}` structs, `{k=v}` maps,
nested brackets. Spark has no such cast, but when the operand is a
visible string literal the whole cast folds at translate time into
array()/named_struct()/map() constructors — JVM-side, no UDF.
"""

from __future__ import annotations

import re

from duckdb_spark.types import duckdb_type_to_spark


class TextCastError(ValueError):
    pass


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on top-level `sep`, respecting quotes and brackets. Backslash
    escapes apply only INSIDE quoted segments (bare-segment backslashes
    are literal and do not protect the separator — reference
    string-to-list grammar)."""
    parts, depth, start, i = [], 0, 0, 0
    quote = None
    while i < len(s):
        c = s[i]
        if quote:
            if c == "\\":
                i += 2
                continue
            if c == quote:
                quote = None
        elif c == "\\" and i + 1 < len(s) and s[i + 1] in "'\"":
            i += 2  # bare-level escaped quote: no quote opens
            continue
        elif c in "'\"`":
            quote = c
        elif c in "[{(":
            depth += 1
        elif c in ")}]":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def _strip_value(s: str) -> tuple[str, bool]:
    """Trim an element; returns (text, was_quoted). Quoted segments
    consume their quotes and unescape `\\x` → x; bare segments keep
    backslashes literally."""
    t = s.strip()
    out: list[str] = []
    quoted_any = False
    i = 0
    while i < len(t):
        c = t[i]
        if c == "\\" and i + 1 < len(t):
            nxt = t[i + 1]
            if nxt in "'\"":
                out.append(nxt)  # bare escaped quote: literal, no run opens
            else:
                out.append(c)  # bare backslash is literal
                out.append(nxt)
            i += 2
            continue
        if c in "'\"":
            # quoted run: quotes consumed, \x → x inside
            quoted_any = True
            q = c
            i += 1
            closed = False
            while i < len(t):
                ch = t[i]
                if ch == "\\" and i + 1 < len(t):
                    out.append(t[i + 1])
                    i += 2
                    continue
                if ch == q:
                    closed = True
                    i += 1
                    break
                out.append(ch)
                i += 1
            if not closed:
                raise TextCastError(
                    f"Conversion Error: value {s!r} can't be cast to the "
                    f"destination type (unterminated quote)"
                )
            continue
        out.append(c)
        i += 1
    return "".join(out), quoted_any


def _quote_sql(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT", "HUGEINT", "UTINYINT",
    "USMALLINT", "UINTEGER", "UBIGINT", "INT1", "INT2", "INT4", "INT8",
    "SHORT", "LONG", "INT16", "INT32", "INT64", "SIGNED",
}
_FLOAT_TYPES = {"FLOAT", "REAL", "DOUBLE", "FLOAT4", "FLOAT8"}


def emit_value(text: str, quoted: bool, ducktype: str) -> str:
    """One parsed element → a Spark SQL expression of the target type."""
    dt = ducktype.strip()
    up = dt.upper()
    m = re.match(r"(?is)^(.*)\[\s*\d*\s*\]$", dt)
    if m:
        return emit_list(text, quoted, m.group(1))
    if re.match(r"(?is)^STRUCT\s*\(", dt):
        return emit_struct(text, dt)
    if re.match(r"(?is)^MAP\s*\(", dt):
        return emit_map(text, dt)
    if not quoted and text.upper() == "NULL":
        return f"cast(null as {duckdb_type_to_spark(dt).simpleString()})"
    if up in ("VARCHAR", "TEXT", "STRING", "BPCHAR", "CHAR") or re.match(
        r"(?i)^VARCHAR\s*\(", dt
    ):
        return _quote_sql(text)
    if up in _INT_TYPES:
        try:
            int(text.strip())
        except ValueError as e:
            raise TextCastError(
                f"Conversion Error: Could not convert string {text!r} to {up}"
            ) from e
        return text.strip()
    if up in _FLOAT_TYPES or re.match(r"(?i)^(DECIMAL|NUMERIC)", dt):
        try:
            float(text.strip())
        except ValueError as e:
            raise TextCastError(
                f"Conversion Error: Could not convert string {text!r} to {up}"
            ) from e
        return f"cast({_quote_sql(text.strip())} as {duckdb_type_to_spark(dt).simpleString()})"
    if up in ("BOOLEAN", "BOOL", "LOGICAL"):
        if text.strip().lower() in ("true", "false"):
            return text.strip().lower()
        raise TextCastError(
            f"Conversion Error: Could not convert string {text!r} to BOOLEAN"
        )
    # dates/timestamps/uuid/…: delegate to a Spark cast of the text
    return f"cast({_quote_sql(text.strip())} as {duckdb_type_to_spark(dt).simpleString()})"


def emit_list(text: str, quoted: bool, elemtype: str) -> str:
    t = text.strip()
    if not quoted and t.upper() == "NULL":
        spark = duckdb_type_to_spark(elemtype + "[]").simpleString()
        return f"cast(null as {spark})"
    if not (t.startswith("[") and t.endswith("]")):
        raise TextCastError(f"Conversion Error: can't cast {text!r} to LIST")
    body = t[1:-1].strip()
    if not body:
        spark = duckdb_type_to_spark(elemtype + "[]").simpleString()
        return f"cast(array() as {spark})"
    items = []
    for part in _split_top(body, ","):
        it, q = _strip_value(part)
        items.append(emit_value(it, q, elemtype))
    return "array(" + ", ".join(items) + ")"


def _struct_fields(ducktype: str) -> list[tuple[str, str]]:
    body = ducktype.strip()[ducktype.index("(") + 1:ducktype.rindex(")")]
    fields = []
    for part in _split_top(body, ","):
        p = part.strip()
        m = re.match(r'(?s)^("([^"]+)"|`([^`]+)`|\S+)\s+(.*)$', p)
        if not m:
            raise TextCastError(f"bad struct field {p!r}")
        name = (m.group(2) or m.group(3) or m.group(1)).strip('"`')
        fields.append((name, m.group(4).strip()))
    return fields


def emit_struct(text: str, ducktype: str) -> str:
    t = text.strip()
    if t.upper() == "NULL":
        return f"cast(null as {duckdb_type_to_spark(ducktype).simpleString()})"
    if not (t.startswith("{") and t.endswith("}")):
        raise TextCastError(f"Conversion Error: can't cast {text!r} to STRUCT")
    body = t[1:-1].strip()
    fields = _struct_fields(ducktype)
    got: dict[str, str] = {}
    if body:
        # a comma-split segment without a top-level ':' belongs to the key
        # of the NEXT segment (keys may contain commas; reference grammar —
        # `{user,name: Alice}` parses, `{age, 30}` does not)
        merged, acc = [], ""
        for part in _split_top(body, ","):
            acc = part if not acc else acc + "," + part
            try:
                _part3(acc, ":")
            except TextCastError:
                continue
            merged.append(acc)
            acc = ""
        if acc.strip():
            raise TextCastError(
                f"Conversion Error: {acc!r} can't be cast to the destination "
                f"type (struct entry without ':')"
            )
        for part in merged:
            k, _, v = _part3(part, ":")
            key, _kq = _strip_value(k)
            vt, vq = _strip_value(v)
            got[key.lower()] = (vt, vq)
    # unknown keys error (missing target fields become NULL — reference
    # struct cast fills gaps but rejects extras)
    known = {f.lower() for f, _ in fields}
    for key in got:
        if key not in known:
            raise TextCastError(
                f"Conversion Error: struct key {key!r} can't be cast to the "
                f"destination type (no matching field)"
            )
    kvs = []
    for fname, ftype in fields:
        if fname.lower() in got:
            vt, vq = got[fname.lower()]
            kvs.append(f"'{fname}', " + emit_value(vt, vq, ftype))
        else:
            kvs.append(
                f"'{fname}', cast(null as {duckdb_type_to_spark(ftype).simpleString()})"
            )
    return "named_struct(" + ", ".join(kvs) + ")"


def _part3(s: str, sep: str) -> tuple[str, str, str]:
    """Split key/value on the first top-level sep (quote/escape aware)."""
    depth, i = 0, 0
    quote = None
    while i < len(s):
        c = s[i]
        if quote:
            if c == "\\":
                i += 2
                continue
            if c == quote:
                quote = None
        elif c == "\\" and i + 1 < len(s) and s[i + 1] in "'\"":
            i += 2  # bare-level escaped quote: no quote opens
            continue
        elif c in "'\"`":
            quote = c
        elif c in "[{(":
            depth += 1
        elif c in ")}]":
            depth -= 1
        elif c == sep and depth == 0:
            return s[:i], sep, s[i + 1:]
        i += 1
    raise TextCastError(f"missing {sep!r} in {s!r}")


def emit_map(text: str, ducktype: str) -> str:
    t = text.strip()
    if t.upper() == "NULL":
        return f"cast(null as {duckdb_type_to_spark(ducktype).simpleString()})"
    if not (t.startswith("{") and t.endswith("}")):
        raise TextCastError(f"Conversion Error: can't cast {text!r} to MAP")
    body = t[1:-1].strip()
    m = re.match(r"(?is)^MAP\s*\((.*)\)$", ducktype.strip())
    kt, vt = _split_top(m.group(1), ",")[:2]
    if not body:
        return f"cast(map() as {duckdb_type_to_spark(ducktype).simpleString()})"
    # a comma-split segment without '=' belongs to the KEY of the next
    # segment (keys may contain commas; values may not — reference grammar)
    merged, acc = [], ""
    for part in _split_top(body, ","):
        acc = part if not acc else acc + "," + part
        try:
            _part3(acc, "=")
        except TextCastError:
            continue
        merged.append(acc)
        acc = ""
    if acc.strip():
        raise TextCastError(
            f"Conversion Error: {acc!r} can't be cast to the destination "
            f"type MAP (entry without '=')"
        )
    kvs = []
    for part in merged:
        k, _, v = _part3(part, "=")
        ktext, kq = _strip_value(k)
        vtext, vq = _strip_value(v)
        kvs.append(emit_value(ktext, kq, kt))
        kvs.append(emit_value(vtext, vq, vt))
    return "map(" + ", ".join(kvs) + ")"


def fold_string_cast(literal_text: str, ducktype: str) -> str | None:
    """`'<literal_text>'::<ducktype>` → Spark constructor expression, or
    None when the target isn't nested (plain casts stay native)."""
    dt = ducktype.strip()
    if re.match(r"(?is)^(.*)\[\s*\d*\s*\]$", dt):
        return "(" + emit_list(literal_text, False, dt[:dt.rindex("[")]) + ")"
    if re.match(r"(?is)^STRUCT\s*\(", dt):
        return "(" + emit_struct(literal_text, dt) + ")"
    if re.match(r"(?is)^MAP\s*\(", dt):
        return "(" + emit_map(literal_text, dt) + ")"
    return None
