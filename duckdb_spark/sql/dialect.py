"""DuckDB-SQL → Spark-SQL dialect translation (SURVEY.md §3.1 step 1-2).

This is the front-end layer we genuinely build (the reference's PEG parser +
binder, `src/parser/parser.cpp:235`, `src/planner/binder.cpp:78`); Catalyst
is the optimizer/executor. Spark 4 natively parses most DuckDB friendly-SQL
(GROUP BY ALL, ORDER BY ALL, SELECT * EXCEPT, PIVOT/UNPIVOT, ILIKE,
TABLESAMPLE, lambdas — probed empirically), so translation is a targeted
set of rewrites for the remainder:

- `SELECT * EXCLUDE (...)`   → `SELECT * EXCEPT (...)`
  (reference star_expression.hpp:36-89)
- `a // b`                   → `a DIV b` (integer floor division)
- `QUALIFY <pred>`           → wrap in a subquery + WHERE
  (reference bind_select_node.cpp:515)
- `SELECT DISTINCT ON (k) …  ORDER BY k, o` → row_number() window rewrite
  (reference logical_distinct.cpp; DuckDB keeps the first row per key
  under the query's ORDER BY)
- `'...'::TYPE` cast sugar   → CAST('...' AS TYPE)

The rewriter is token-aware (strings/identifiers/comments are opaque,
nesting tracked) — not a regex pass over raw text.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"""
      '(?:[^']|'')*'            # single-quoted string
    | "(?:[^"]|"")*"            # double-quoted identifier
    | --[^\n]*                  # line comment
    | /\*.*?\*/                 # block comment
    | [A-Za-z_][A-Za-z_0-9$]*   # word
    | ::| // | <= | >= | <> | != | \|\| | ->> | -> | =>
    | .                         # any single char
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokens(sql: str) -> list[str]:
    return _TOKEN_RE.findall(sql)


def _is_word(tok: str, word: str) -> bool:
    return tok.upper() == word


def _find_top_level(toks: list[str], word: str, start: int = 0) -> int:
    """Index of a top-level (depth-0) keyword token, or -1."""
    depth = 0
    for i in range(start, len(toks)):
        t = toks[i]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _is_word(t, word):
            return i
    return -1


def _rewrite_exclude(toks: list[str]) -> list[str]:
    """EXCLUDE → EXCEPT when it follows `*` (star expression modifier)."""
    out = list(toks)
    for i, t in enumerate(out):
        if _is_word(t, "EXCLUDE"):
            j = i - 1
            while j >= 0 and out[j].isspace():
                j -= 1
            if j >= 0 and out[j] == "*":
                out[i] = "EXCEPT"
    return out


def _rewrite_floordiv(toks: list[str]) -> list[str]:
    return [" DIV " if t == "//" else t for t in toks]


def _rewrite_pg_cast(toks: list[str]) -> list[str]:
    """expr::TYPE → CAST(expr AS TYPE) for simple (literal/identifier/
    parenthesized) operands and word-or-word(args) type names."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        if toks[i] == "::" and out:
            # operand: walk back over one balanced unit
            j = len(out) - 1
            while j >= 0 and out[j].isspace():
                j -= 1
            if j < 0:
                out.append(toks[i]); i += 1; continue
            if out[j] == ")":
                depth = 0
                k = j
                while k >= 0:
                    if out[k] == ")":
                        depth += 1
                    elif out[k] == "(":
                        depth -= 1
                        if depth == 0:
                            break
                    k -= 1
                # include preceding function name if present
                m = k - 1
                while m >= 0 and out[m].isspace():
                    m -= 1
                if m >= 0 and re.match(r"[A-Za-z_]", out[m]):
                    k = m
                start = k
            else:
                start = j
                # allow dotted identifiers: a.b::T
                while start - 2 >= 0 and out[start - 1] == "." :
                    start -= 2
            # type tokens: WORD [ ( ... ) ] or WORD [ ] for arrays
            i += 1
            ty: list[str] = []
            while i < len(toks) and toks[i].isspace():
                i += 1
            while i < len(toks) and (
                re.match(r"[A-Za-z_]", toks[i]) or toks[i] in "()[]0123456789," or toks[i].isdigit()
            ):
                ty.append(toks[i])
                i += 1
                if ty and ty[-1] == ")":
                    break
                if i < len(toks) and toks[i].isspace() and (i + 1 < len(toks) and not re.match(r"[A-Za-z_0-9(\[]", toks[i + 1])):
                    break
            operand = "".join(out[start:]).strip()
            del out[start:]
            out.append(f"CAST({operand} AS {''.join(ty).strip()})")
            continue
        out.append(toks[i])
        i += 1
    return out


def _split_clauses(sql: str) -> dict[str, str]:
    """Split one SELECT block into clause strings by top-level keywords."""
    toks = _tokens(sql)
    marks: list[tuple[int, str]] = []
    i = 0
    depth = 0
    while i < len(toks):
        t = toks[i]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0:
            up = t.upper()
            if up in ("SELECT", "FROM", "WHERE", "GROUP", "HAVING", "QUALIFY", "WINDOW", "ORDER", "LIMIT", "OFFSET"):
                if up in ("GROUP", "ORDER"):
                    # require following BY
                    j = i + 1
                    while j < len(toks) and toks[j].isspace():
                        j += 1
                    if j < len(toks) and toks[j].upper() == "BY":
                        marks.append((i, up))
                else:
                    marks.append((i, up))
        i += 1
    clauses: dict[str, str] = {}
    for n, (idx, name) in enumerate(marks):
        end = marks[n + 1][0] if n + 1 < len(marks) else len(toks)
        clauses[name] = "".join(toks[idx:end])
    return clauses


def _rewrite_qualify(sql: str) -> str:
    """SELECT ... QUALIFY pred [ORDER BY ...] [LIMIT ...] →
    SELECT * FROM ( SELECT ... ) __q WHERE pred [ORDER BY ...] [LIMIT ...]"""
    toks = _tokens(sql)
    qi = _find_top_level(toks, "QUALIFY")
    if qi < 0:
        return sql
    clauses = _split_clauses(sql)
    qualify_body = re.sub(r"(?i)^QUALIFY\s*", "", clauses["QUALIFY"]).strip()
    tail = "".join(clauses.get(k, "") for k in ("ORDER", "LIMIT", "OFFSET"))
    inner = "".join(
        clauses.get(k, "") for k in ("SELECT", "FROM", "WHERE", "GROUP", "HAVING", "WINDOW")
    )
    return f"SELECT * FROM ({inner.strip()}) __qualify WHERE {qualify_body} {tail.strip()}".strip()


def _rewrite_distinct_on(sql: str) -> str:
    """SELECT DISTINCT ON (keys) sel FROM ... [WHERE ...] ORDER BY o1, o2 →
    row_number() PARTITION BY keys ORDER BY <order-minus-keys> rewrite."""
    m = re.match(r"(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(", sql)
    if not m:
        return sql
    toks = _tokens(sql)
    # find the ON ( ... ) span
    oi = _find_top_level(toks, "ON")
    depth = 0
    start = None
    for i in range(oi, len(toks)):
        if toks[i] == "(":
            depth += 1
            if start is None:
                start = i
        elif toks[i] == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    keys = "".join(toks[start + 1 : end]).strip()
    rest = "".join(toks[end + 1 :]).strip()  # select list + FROM ...
    clauses = _split_clauses("SELECT " + rest)
    sel = re.sub(r"(?i)^SELECT\s*", "", clauses["SELECT"]).strip()
    order = re.sub(r"(?i)^ORDER\s+BY\s*", "", clauses.get("ORDER", "")).strip()
    body = "".join(clauses.get(k, "") for k in ("FROM", "WHERE", "GROUP", "HAVING"))
    order_expr = order if order else keys
    inner = (
        f"SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {order_expr}) AS __rn "
        f"{body.strip()}"
    )
    tail = "".join(clauses.get(k, "") for k in ("LIMIT", "OFFSET"))
    return f"SELECT {sel} FROM ({inner}) __distinct_on WHERE __rn = 1 {tail}".strip()


def _rewrite_named_windows(sql: str) -> str:
    """Inline `WINDOW w AS (...)` definitions into OVER references —
    including DuckDB's frame-extension form `OVER (w ROWS ...)`, which
    Spark's named-window support can't parse. The WINDOW clause itself is
    removed after inlining."""
    m = re.search(r"(?is)\bWINDOW\s+([A-Za-z_][A-Za-z_0-9]*)\s+AS\s*\(", sql)
    if not m:
        return sql
    while m:
        name = m.group(1)
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        body = sql[m.end() : i - 1]
        # strip this definition (and an optional trailing comma for multi-defs)
        rest = re.sub(r"(?s)^\s*,", " WINDOW ", sql[i:], count=1)
        sql = sql[: m.start()] + " " + rest
        # OVER (w <frame-extension>) → OVER (<body> <frame-extension>)
        sql = re.sub(
            rf"(?is)\bOVER\s*\(\s*{name}\b", f"OVER ({body} ", sql
        )
        # bare OVER w → OVER (<body>)
        sql = re.sub(rf"(?is)\bOVER\s+{name}\b", f"OVER ({body})", sql)
        m = re.search(r"(?is)\bWINDOW\s+([A-Za-z_][A-Za-z_0-9]*)\s+AS\s*\(", sql)
    return sql


def translate(sql: str) -> str:
    """DuckDB dialect → Spark SQL. Idempotent on plain ANSI SQL."""
    toks = _tokens(sql)
    toks = _rewrite_exclude(toks)
    toks = _rewrite_floordiv(toks)
    toks = _rewrite_pg_cast(toks)
    out = "".join(toks)
    out = _rewrite_named_windows(out)
    out = _rewrite_distinct_on(out)
    out = _rewrite_qualify(out)
    return out


def split_union_by_name(sql: str) -> tuple[list[str], list[str], str] | None:
    """Detect top-level `UNION [ALL] BY NAME` (DuckDB-only; Spark has no SQL
    spelling). Returns (branch_sqls, set_ops, trailing_clause) or None.
    The caller unions the branches with DataFrame unionByName."""
    toks = _tokens(sql)
    idx: list[tuple[int, str]] = []
    depth = 0
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _is_word(t, "UNION"):
            j = i + 1
            while j < len(toks) and toks[j].isspace():
                j += 1
            op = "UNION"
            if j < len(toks) and _is_word(toks[j], "ALL"):
                op = "UNION ALL"
                j += 1
                while j < len(toks) and toks[j].isspace():
                    j += 1
            if j < len(toks) and _is_word(toks[j], "BY"):
                k = j + 1
                while k < len(toks) and toks[k].isspace():
                    k += 1
                if k < len(toks) and _is_word(toks[k], "NAME"):
                    idx.append((i, op))
                    # blank out the operator tokens; branch split below
                    for z in range(i, k + 1):
                        toks[z] = "\x00" if z == i else ""
        i += 1
    if not idx:
        return None
    joined = "".join(t if t != "\x00" else "\x00" for t in toks)
    branches = joined.split("\x00")
    # trailing ORDER BY / LIMIT of the final branch applies to the whole union
    last = branches[-1]
    clauses = _split_clauses("SELECT 1 FROM t " + last) if last.strip().upper().startswith(("ORDER", "LIMIT")) else None
    tail = ""
    if clauses is None:
        lc = _split_clauses(last)
        tail = "".join(lc.get(k, "") for k in ("ORDER", "LIMIT", "OFFSET"))
        if tail:
            # Cut at the token offset of the first top-level ORDER BY/LIMIT/
            # OFFSET — a substring rindex could land inside an identifier
            # (e.g. o_orderkey contains 'ORDER').
            ltoks = _tokens(last)
            cut = len(last)
            pos = 0
            depth = 0
            for n, t in enumerate(ltoks):
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth -= 1
                elif depth == 0:
                    up = t.upper()
                    if up in ("LIMIT", "OFFSET"):
                        cut = pos
                        break
                    if up == "ORDER":
                        j = n + 1
                        while j < len(ltoks) and ltoks[j].isspace():
                            j += 1
                        if j < len(ltoks) and ltoks[j].upper() == "BY":
                            cut = pos
                            break
                pos += len(t)
            branches[-1] = last[:cut]
    return [b.strip() for b in branches], [op for _, op in idx], tail.strip()
