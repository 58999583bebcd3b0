"""SQL macros and sequences — catalog-layer features Spark lacks.

Reference semantics:
- `CREATE MACRO name(p1, p2 := default) AS expr` (scalar) and
  `CREATE MACRO name(...) AS TABLE select` — macros are *inlined at bind
  time*, never executed as calls (`src/function/macro_function.cpp`,
  `scalar_macro_function.cpp`, `table_macro_function.cpp`). We do the
  same: textual expansion with balanced-paren argument substitution
  before the dialect translator runs.
- `CREATE SEQUENCE` / `nextval('seq')` (`sequence_catalog_entry.cpp`):
  driver-side counters — gap-free single-driver semantics, matching the
  reference's in-process model. (Distributed gap-free sequences don't
  exist on any engine; use uuid()/monotonically_increasing_id for scale.)
"""

from __future__ import annotations

import re


class Macro:
    def __init__(self, name: str, params: list[str], defaults: dict[str, str], body: str,
                 is_table: bool):
        self.name = name
        self.params = params
        self.defaults = defaults
        self.body = body
        self.is_table = is_table


_CREATE_RE = re.compile(
    r"(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?"
    r"(?:MACRO|FUNCTION)\s+"  # CREATE FUNCTION is the reference's alias
    r"([A-Za-z_][A-Za-z_0-9]*)\s*\(([^)]*)\)\s*AS\s+(TABLE\s+)?(.*)$"
)

_CREATE_SEQ_RE = re.compile(
    r"(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?SEQUENCE\s+"
    r"([A-Za-z_][A-Za-z_0-9]*)(?:\s+START\s+(?:WITH\s+)?(\d+))?(?:\s+INCREMENT\s+(?:BY\s+)?(\d+))?"
)


def _correlated_seq_rowctx(sql: str) -> bool:
    """True when some nextval() sits in a correlated no-FROM subquery of a
    FROM-bearing statement. Such a call is per-row volatile (reference
    sequence_catalog_entry.cpp): it must advance once per physical outer
    row, so textual inlining would be wrong-multiplicity."""
    for m in re.finditer(r"(?i)\bnextval\s*\(\s*'", sql):
        pos = m.start()
        if _has_from_in_scope(sql, pos):
            continue  # handled by the per-row refusal below
        # innermost paren span containing pos (quote-aware)
        stack: list[int] = []
        span = None
        in_q = False
        for i, c in enumerate(sql):
            if c == "'":
                in_q = not in_q
            elif not in_q:
                if c == "(":
                    stack.append(i)
                elif c == ")" and stack:
                    st = stack.pop()
                    if st < pos < i:
                        span = (st + 1, i)
                        break
        if span is None:
            continue
        seg = sql[span[0]:span[1]]
        if re.match(r"(?is)^\s*SELECT\b", seg) and re.search(
            r"\b[A-Za-z_]\w*\.[A-Za-z_]\w*", re.sub(r"'[^']*'", "", seg)
        ) and re.search(r"(?is)\bFROM\b",
                        sql[:span[0]] + sql[span[1]:]):
            return True
    return False


def _has_from_in_scope(sql: str, pos: int) -> bool:
    """True when the innermost set-op branch of the innermost paren scope
    containing `pos` has its own FROM — nextval there is per-row volatile;
    an anchor `SELECT 1, nextval('s')` inside a FROM-bearing statement is
    still statement-scalar (cte/recursive_cte_column_pruning.test)."""
    # innermost paren span containing pos (quote-aware)
    stack: list[int] = []
    span = (0, len(sql))
    i = 0
    in_q = False
    while i < len(sql):
        c = sql[i]
        if c == "'":
            in_q = not in_q
        elif not in_q:
            if c == "(":
                stack.append(i)
            elif c == ")":
                if stack:
                    st = stack.pop()
                    if st < pos < i and not stack:
                        pass  # outermost-closed spans handled below
                    if st < pos < i:
                        span = (st + 1, i)
                        break
        i += 1
    seg = sql[span[0]:span[1]]
    rel = pos - span[0]
    # split at top-level set ops; keep the branch containing pos
    parts: list[tuple[int, int]] = []
    depth = 0
    last = 0
    in_q = False
    for j, c in enumerate(seg):
        if c == "'":
            in_q = not in_q
        elif not in_q:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
        if depth == 0 and not in_q and re.match(
            r"(?i)(UNION|EXCEPT|INTERSECT)\b", seg[j:],
        ) and (j == 0 or not (seg[j - 1].isalnum() or seg[j - 1] == "_")):
            parts.append((last, j))
            last = j
    parts.append((last, len(seg)))
    for lo, hi in parts:
        if lo <= rel < hi:
            seg = seg[lo:hi]
            break
    # FROM at depth 0 of that branch
    depth = 0
    in_q = False
    for j, c in enumerate(seg):
        if c == "'":
            in_q = not in_q
        elif not in_q:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and re.match(r"(?i)FROM\b", seg[j:]) and (
                j == 0 or not (seg[j - 1].isalnum() or seg[j - 1] == "_")
            ):
                return True
    return False


def _split_args(s: str) -> list[str]:
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
    if s[start:].strip():
        parts.append(s[start:])
    return [p.strip() for p in parts]


class MacroRegistry:
    """Session-scoped macro + sequence catalog."""

    def __init__(self):
        self._macros: dict[str, Macro] = {}
        self._sequences: dict[str, dict] = {}

    # -- DDL ---------------------------------------------------------------
    def handle_ddl(self, sql: str) -> bool:
        """Returns True if sql was a macro/sequence DDL (and was handled)."""
        m = _CREATE_RE.match(sql)
        if m:
            name, params_s, table_kw, body = m.groups()
            params, defaults = [], {}
            for p in _split_args(params_s):
                if ":=" in p:
                    pname, dflt = p.split(":=", 1)
                    params.append(pname.strip())
                    defaults[pname.strip()] = dflt.strip()
                elif p:
                    params.append(p.strip())
            self._macros[name.lower()] = Macro(
                name.lower(), params, defaults, body.strip().rstrip(";"), bool(table_kw)
            )
            return True
        s = _CREATE_SEQ_RE.match(sql)
        if s:
            name, start, inc = s.groups()
            self._sequences[name.lower()] = {
                "value": int(start or 1) - int(inc or 1),
                "increment": int(inc or 1),
            }
            return True
        t = re.match(
            r"(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?TYPE\s+"
            r"([\w\".]+)\s+AS\s+(.*?)\s*;?\s*$", sql,
        )
        if t:
            from duckdb_spark.sql.dialect import register_type_alias

            register_type_alias(t.group(1), t.group(2))
            return True
        t = re.match(
            r"(?is)^\s*DROP\s+TYPE\s+(?:IF\s+EXISTS\s+)?([\w\".]+)\s*;?\s*$",
            sql,
        )
        if t:
            from duckdb_spark.sql.dialect import unregister_type_alias

            unregister_type_alias(t.group(1))
            return True
        t = re.match(r"(?is)^\s*USE\s+([\w\"]+)\s*;?\s*$", sql)
        if t:
            from duckdb_spark.sql.dialect import set_session_setting

            self_name = t.group(1).strip().strip('"')
            set_session_setting("search_path", self_name)
            return True
        t = re.match(
            r"(?is)^\s*SET\s+SEARCH_PATH\s*(?:TO|=)\s*([\w\"., ]+?)\s*;?\s*$",
            sql,
        )
        if t:
            from duckdb_spark.sql.dialect import set_session_setting

            set_session_setting(
                "search_path", t.group(1).split(",")[0].strip().strip('"')
            )
            return True
        if re.match(r"(?is)^\s*DROP\s+MACRO\s+([A-Za-z_][A-Za-z_0-9]*)", sql):
            name = re.match(r"(?is)^\s*DROP\s+MACRO\s+([A-Za-z_][A-Za-z_0-9]*)", sql).group(1)
            self._macros.pop(name.lower(), None)
            return True
        if re.match(r"(?is)^\s*DROP\s+SEQUENCE\s+([A-Za-z_][A-Za-z_0-9]*)", sql):
            name = re.match(r"(?is)^\s*DROP\s+SEQUENCE\s+([A-Za-z_][A-Za-z_0-9]*)", sql).group(1)
            self._sequences.pop(name.lower(), None)
            return True
        return False

    # -- sequences ---------------------------------------------------------
    def nextval(self, name: str) -> int:
        seq = self._sequences[name.lower()]
        seq["value"] += seq["increment"]
        return seq["value"]

    def currval(self, name: str) -> int:
        return self._sequences[name.lower()]["value"]

    # -- expansion ---------------------------------------------------------
    def expand(self, sql: str, max_depth: int = 10) -> str:
        """Inline macro calls (and nextval/currval literals) textually."""
        for _ in range(max_depth):
            new = self._expand_once(sql)
            if new == sql:
                return sql
            sql = new
        raise RecursionError("macro expansion did not converge (recursive macro?)")

    def _expand_once(self, sql: str) -> str:
        defer_rowctx = _correlated_seq_rowctx(sql)

        def sub_seq(m: re.Match) -> str:
            fn, name = m.group(1).lower(), m.group(2)
            if name.lower() not in self._sequences:
                return m.group(0)
            if defer_rowctx:
                # a nextval sits in a CORRELATED no-FROM subquery — it must
                # run once per physical outer row, so expansion defers the
                # whole statement's sequence calls to the decorrelator,
                # which re-expands each per-row bound statement (and the
                # rewritten outer query) separately
                # (test_correlated_side_effects.test:18)
                return m.group(0)
            # nextval in LIMIT/OFFSET is statement-scalar (evaluated once,
            # reference physical_limit.cpp) — only row-context uses are
            # per-row volatile
            lim = None
            for lm in re.finditer(r"(?i)\b(LIMIT|OFFSET)\b", sql):
                if lim is None or lm.start() < lim:
                    lim = lm.start()
            in_limit = lim is not None and m.start() > lim
            if fn == "nextval" and not in_limit and \
                    _has_from_in_scope(sql, m.start()):
                # Reference nextval is per-row volatile
                # (sequence_catalog_entry.cpp); a textual constant would give
                # every row the same value. Refuse rather than silently
                # diverge. (currval IS statement-stable, so it still inlines.)
                raise NotImplementedError(
                    "nextval() in a FROM-bearing query needs per-row "
                    "evaluation; use monotonically_increasing_id()/row_number "
                    "for distributed id assignment"
                )
            # Advancing at expansion time matches engine semantics: sequences
            # are non-transactional — a failed/rolled-back query still burns
            # the value.
            return str(self.nextval(name) if fn == "nextval" else self.currval(name))

        sql = re.sub(r"(?i)\b(nextval|currval)\s*\(\s*'([^']+)'\s*\)", sub_seq, sql)

        for name, macro in self._macros.items():
            pattern = re.compile(rf"(?i)\b{re.escape(name)}\s*\(", re.IGNORECASE)
            m = pattern.search(sql)
            while m:
                # balanced-paren argument span
                depth, i = 1, m.end()
                while i < len(sql) and depth:
                    if sql[i] == "(":
                        depth += 1
                    elif sql[i] == ")":
                        depth -= 1
                    i += 1
                args = _split_args(sql[m.end() : i - 1])
                binding = dict(macro.defaults)
                pos = 0
                for a in args:
                    named = re.match(r"^\s*([A-Za-z_][A-Za-z_0-9]*)\s*:=\s*(.*)$", a, re.S)
                    if named and named.group(1) in macro.params:
                        binding[named.group(1)] = named.group(2).strip()
                    else:
                        if pos >= len(macro.params):
                            raise ValueError(
                                f"macro {macro.name} takes {len(macro.params)} "
                                f"argument(s), got {len(args)}"
                            )
                        binding[macro.params[pos]] = a
                        pos += 1
                missing = [p for p in macro.params if p not in binding]
                if missing:
                    raise ValueError(
                        f"macro {macro.name}: missing argument(s) {missing}"
                    )
                body = macro.body
                # parameter substitution, longest names first
                for p in sorted(macro.params, key=len, reverse=True):
                    body = re.sub(rf"\b{re.escape(p)}\b", f"({binding[p]})", body)
                rest = sql[i:]
                mover = re.match(r"(?is)^\s*OVER\s*\(", rest)
                if mover and not macro.is_table:
                    # `macro(x) OVER (spec)` (reference window macro
                    # binding): the OVER attaches to each aggregate call
                    # inside the body, not to the whole expression
                    depth2, k2 = 1, mover.end()
                    while k2 < len(rest) and depth2:
                        if rest[k2] == "(":
                            depth2 += 1
                        elif rest[k2] == ")":
                            depth2 -= 1
                        k2 += 1
                    spec = rest[mover.end():k2 - 1]
                    body = _push_over_into_aggs(body, spec)
                    rest = rest[k2:]
                expansion = f"({body})" if not macro.is_table else f"({body})"
                sql = sql[: m.start()] + expansion + rest
                m = pattern.search(sql)
        return sql


_AGG_FN_NAMES = {
    "sum", "count", "avg", "mean", "min", "max", "median", "mode",
    "first", "last", "any_value", "arbitrary", "product", "string_agg",
    "group_concat", "listagg", "list", "array_agg", "collect_list",
    "collect_set", "stddev", "stddev_pop", "stddev_samp", "var_pop",
    "var_samp", "variance", "corr", "covar_pop", "covar_samp",
    "bit_and", "bit_or", "bit_xor", "bool_and", "bool_or", "entropy",
    "arg_min", "arg_max", "min_by", "max_by", "quantile", "quantile_cont",
    "quantile_disc", "histogram", "skewness", "kurtosis", "sem", "mad",
}


def _push_over_into_aggs(body: str, spec: str) -> str:
    """Append ` OVER (spec)` after each top-level aggregate call in a
    macro body (reference: window macros bind the OVER to the inner
    aggregates)."""
    out = []
    i = 0
    n = len(body)
    while i < n:
        mw = re.match(r"[A-Za-z_]\w*", body[i:])
        if not mw:
            out.append(body[i])
            i += 1
            continue
        word = mw.group(0)
        j = i + len(word)
        while j < n and body[j].isspace():
            j += 1
        if j < n and body[j] == "(" and word.lower() in _AGG_FN_NAMES:
            depth, k = 1, j + 1
            while k < n and depth:
                if body[k] == "(":
                    depth += 1
                elif body[k] == ")":
                    depth -= 1
                k += 1
            out.append(body[i:k])
            out.append(f" OVER ({spec})")
            i = k
        else:
            out.append(word)
            i = i + len(word)
    return "".join(out)


class _RawParam(str):
    """EXECUTE argument spliced verbatim (nested-value expression text)."""


def quote_literal(v) -> str:
    """Render a Python value as a SQL literal (reference parameter binding,
    src/main/client_context.cpp:535-579 PendingStatementOrPreparedStatement:
    values bind into the prepared plan; on our text-level layer they inline
    as correctly-quoted literals)."""
    import datetime

    if isinstance(v, _RawParam):
        return str(v)
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(quote_literal(x) for x in v) + "]"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def bind_parameters(sql: str, params) -> str:
    """Substitute `?` positional or `$1`/`$name` parameters with quoted
    literals, skipping occurrences inside string literals."""
    out = []
    i = 0
    pos = 0
    in_str = False
    params_list = list(params) if not isinstance(params, dict) else None
    while i < len(sql):
        ch = sql[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            out.append(ch)
            i += 1
            continue
        if ch == "?" and params_list is not None:
            if pos >= len(params_list):
                raise ValueError("not enough parameters for '?' placeholders")
            out.append(quote_literal(params_list[pos]))
            pos += 1
            i += 1
            continue
        if ch == "$" and i + 1 < len(sql):
            j = i + 1
            while j < len(sql) and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            token = sql[i + 1 : j]
            if token:
                if token.isdigit() and params_list is not None:
                    idx = int(token) - 1
                    if idx >= len(params_list):
                        raise ValueError(f"missing parameter ${token}")
                    out.append(quote_literal(params_list[idx]))
                elif isinstance(params, dict) and token in params:
                    out.append(quote_literal(params[token]))
                else:
                    raise ValueError(f"unbound parameter ${token}")
                i = j
                continue
        out.append(ch)
        i += 1
    return "".join(out)


_PREPARE_RE = re.compile(
    r"(?is)^\s*PREPARE\s+([A-Za-z_][A-Za-z_0-9]*)\s+AS\s+(.*)$"
)
_EXECUTE_RE = re.compile(
    r"(?is)^\s*EXECUTE\s+([A-Za-z_][A-Za-z_0-9]*)\s*(?:\((.*)\))?\s*;?\s*$"
)
_DEALLOC_RE = re.compile(r"(?is)^\s*DEALLOCATE\s+(?:PREPARE\s+)?([A-Za-z_][A-Za-z_0-9]*)")


class PreparedStatements:
    """PREPARE name AS stmt / EXECUTE name(args) / DEALLOCATE name
    (reference prepared-statement lifecycle, src/main/prepared_statement.cpp).
    Statement text is stored at PREPARE time; EXECUTE binds positional
    arguments ($1..$n or ?) and returns the bound SQL for planning —
    Catalyst (re)optimizes per execution, which on Spark is the correct
    trade (plans are parameter-dependent anyway: AQE, pruning)."""

    def __init__(self):
        self._stmts: dict[str, str] = {}

    def handle(self, sql: str):
        """Returns None if not a prepared-statement command; True if handled
        DDL (PREPARE/DEALLOCATE); the bound SQL string for EXECUTE."""
        m = _PREPARE_RE.match(sql)
        if m:
            body = m.group(2).strip().rstrip(";")
            if re.search(r"(?is)\bDISTINCT\s+ON\s*\([^)]*\?", body):
                # reference binder rejects parameters in DISTINCT ON
                raise ValueError(
                    "Binder Error: Parameter not supported in DISTINCT ON "
                    "clause")
            self._stmts[m.group(1).lower()] = body
            return True
        m = _DEALLOC_RE.match(sql)
        if m:
            self._stmts.pop(m.group(1).lower(), None)
            return True
        m = _EXECUTE_RE.match(sql)
        if m:
            name = m.group(1).lower()
            if name not in self._stmts:
                raise KeyError(f"prepared statement {name!r} does not exist")
            args_s = m.group(2) or ""
            args = []
            for part in _split_args(args_s):
                part = part.strip()
                if not part:
                    continue
                if part.startswith("'") and part.endswith("'"):
                    args.append(part[1:-1].replace("''", "'"))
                elif part.upper() in ("TRUE", "FALSE"):
                    args.append(part.upper() == "TRUE")
                elif part.upper() == "NULL":
                    args.append(None)
                elif part.startswith(("{", "[")) or re.match(
                    r"(?is)^(row|struct|named_struct|struct_pack|map|"
                    r"list_value|array|cast)\s*\(", part,
                ):
                    # nested-value parameter: splice the expression text
                    # verbatim; the dialect translates it downstream
                    # (struct_concat.test:82 EXECUTE v1({'b': 42}))
                    args.append(_RawParam(part))
                else:
                    try:
                        args.append(int(part))
                    except ValueError:
                        args.append(float(part))
            return bind_parameters(self._stmts[name], args)
        return None
