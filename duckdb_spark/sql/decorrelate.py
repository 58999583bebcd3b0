"""Deep correlated-subquery fallback (reference
src/planner/subquery/flatten_dependent_join.cpp).

Catalyst's DecorrelateInnerQuery handles equality-correlated predicates in
WHERE; the reference flattens ARBITRARY correlation — under aggregates,
windows, grouping sets, in quantifier comparisons. When Spark refuses a
plan (UNSUPPORTED_SUBQUERY_EXPRESSION / INVALID_WHERE_CONDITION /
SCALAR_SUBQUERY_IS_IN_GROUP_BY_OR_AGGREGATE_FUNCTION ...), this retry-only
pass manually flattens each hard subquery:

1. find its correlated references (outer-alias-qualified columns, plus
   unqualified names resolvable only in the outer scope),
2. evaluate the subquery once per DISTINCT outer key (driver loop, capped
   at MAX_KEYS with a loud bail — this is a correctness fallback for
   plans Spark cannot run at all, not a 100 TB path),
3. materialize (key..., value) as a temp view, and
4. replace the subquery with a SIMPLE equality-correlated lookup
   (`SELECT __v FROM __dkcorr_N WHERE __k0 <=> <outer ref> ...`) that
   Catalyst CAN decorrelate into a join.

Scalar position yields the first value per key; EXISTS yields a boolean;
IN/ANY/ALL positions keep every row per key (set semantics preserved).

Known-unsound shape (bails): a non-windowed aggregate whose arguments
reference ONLY outer columns is evaluated in the OUTER context by the
reference (SQL-standard scoping, test_many_correlated_columns.test:22);
per-key binding would evaluate it over the inner rows.
"""

from __future__ import annotations

import re

MAX_KEYS = 500
_SEQ = [0]

_AGG_NAMES = {
    "sum", "min", "max", "avg", "count", "stddev", "stddev_pop",
    "stddev_samp", "var_pop", "var_samp", "variance", "median", "mode",
    "string_agg", "group_concat", "listagg", "list", "array_agg", "first",
    "last", "any_value", "arg_min", "arg_max", "bit_and", "bit_or",
    "bit_xor", "bool_and", "bool_or", "product", "quantile",
    "quantile_cont", "quantile_disc", "approx_count_distinct", "entropy",
    "kurtosis", "skewness", "corr", "covar_pop", "covar_samp",
}

_OUTER_POS_GUARD = {
    # a "(SELECT" preceded by one of these is NOT an expression/quantifier
    # position we flatten
    "FROM", "JOIN", "LATERAL", "TABLE", "AS", "UNION", "EXCEPT",
    "INTERSECT", "INSERT", "VALUES", "USING",
}


def _word(t: str) -> bool:
    return bool(re.match(r"^[A-Za-z_]", t))


def _outer_from_span(toks: list[str]) -> tuple[int, int] | None:
    """(start, end) token span of the outermost FROM clause's item list
    (exclusive of the FROM keyword and of the trailing clause keyword)."""
    from duckdb_spark.sql.dialect import _prev_code

    depth = 0
    start = -1
    for i, t in enumerate(toks):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _word(t) and t.upper() == "FROM":
            pv = _prev_code(toks, i - 1)
            if pv >= 0 and _word(toks[pv]) and toks[pv].upper() in (
                "DISTINCT", "EXTRACT", "SUBSTRING", "TRIM",
            ):
                continue
            start = i + 1
            break
    if start < 0:
        return None
    depth = 0
    end = len(toks)
    i = start
    while i < len(toks):
        t = toks[i]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _word(t) and t.upper() in (
            "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
            "WINDOW", "QUALIFY", "UNION", "EXCEPT", "INTERSECT",
        ):
            end = i
            break
        i += 1
    return start, end


def _columns_of(spark, table: str) -> set[str] | None:
    try:
        return {f.name.lower() for f in spark.table(table).schema.fields}
    except Exception:  # noqa: BLE001
        return None


def _find_refs(s_toks: list[str], outer_aliases: dict[str, str],
               outer_cols: dict[str, set[str]], spark) -> list[str] | None:
    """Correlated reference expressions inside the subquery tokens, or
    None when the shape is one we must not flatten."""
    from duckdb_spark.sql.dialect import (
        _match_paren,
        _nestcmp_from_tables,
        _next_code,
        _prev_code,
    )

    own = _nestcmp_from_tables(s_toks)
    own_cols: set[str] = set()
    own_unresolved = False
    for tbl in set(own.values()):
        cols = _columns_of(spark, tbl)
        if cols is None:
            own_unresolved = True
        else:
            own_cols |= cols
    all_outer_cols = set()
    for cs in outer_cols.values():
        all_outer_cols |= cs
    refs: list[str] = []
    i = 0
    n = len(s_toks)
    while i < n:
        t = s_toks[i]
        if not _word(t):
            i += 1
            continue
        low = t.lower()
        nx = _next_code(s_toks, i + 1)
        pv = _prev_code(s_toks, i - 1)
        if nx < n and s_toks[nx] == ".":
            # qualified: alias.col
            c = _next_code(s_toks, nx + 1)
            if c < n and _word(s_toks[c]):
                if low in outer_aliases and low not in own:
                    refs.append(f"{t}.{s_toks[c]}")
                i = c + 1
                continue
        if nx < n and s_toks[nx] == "(":
            # function call — pure-outer aggregate bail check
            if low in _AGG_NAMES:
                close = _match_paren(s_toks, nx)
                if close > 0:
                    arg = s_toks[nx + 1:close]
                    arg_ids = [
                        a.lower() for a in arg
                        if _word(a) and a.upper() not in ("DISTINCT",)
                    ]
                    has_outer = False
                    has_inner = False
                    k = 0
                    while k < len(arg):
                        a = arg[k]
                        if _word(a):
                            al = a.lower()
                            k2 = k + 1
                            while k2 < len(arg) and arg[k2].isspace():
                                k2 += 1
                            if k2 < len(arg) and arg[k2] == ".":
                                if al in own:
                                    has_inner = True
                                elif al in outer_aliases:
                                    has_outer = True
                                k = k2 + 1
                            elif k2 < len(arg) and arg[k2] == "(":
                                pass  # nested call name
                            elif al in own_cols:
                                has_inner = True
                            elif al in all_outer_cols and \
                                    not own_unresolved:
                                has_outer = True
                        k += 1
                    # '*' (count(*)) counts as inner
                    if any(a == "*" for a in arg):
                        has_inner = True
                    if has_outer and not has_inner:
                        # is it windowed? OVER right after the call
                        after = _next_code(s_toks, close + 1)
                        if not (after < n and _word(s_toks[after]) and
                                s_toks[after].upper() == "OVER"):
                            return None
            i += 1
            continue
        if pv >= 0 and s_toks[pv] == ".":
            i += 1
            continue
        if low in own or low in outer_aliases:
            i += 1
            continue
        if t.upper() in ("SELECT", "FROM", "WHERE", "GROUP", "BY", "AND",
                         "OR", "NOT", "AS", "ON", "JOIN", "ORDER", "LIMIT",
                         "NULL", "TRUE", "FALSE", "IN", "EXISTS", "IS",
                         "LIKE", "BETWEEN", "CASE", "WHEN", "THEN", "ELSE",
                         "END", "HAVING", "DISTINCT", "ASC", "DESC",
                         "NULLS", "FIRST", "LAST", "OVER", "PARTITION",
                         "UNION", "ALL", "ANY", "SOME", "EXCEPT",
                         "INTERSECT", "LEFT", "RIGHT", "INNER", "OUTER",
                         "FULL", "CROSS", "USING", "INTERVAL", "CAST",
                         "OFFSET", "ROWS", "RANGE", "GROUPS", "UNBOUNDED",
                         "PRECEDING", "FOLLOWING", "CURRENT", "ROW",
                         "FILTER", "WITHIN", "LATERAL", "VALUES", "SETS",
                         "CUBE", "ROLLUP", "GROUPING", "WINDOW", "QUALIFY"):
            i += 1
            continue
        if low not in own_cols and low in all_outer_cols and \
                not own_unresolved:
            refs.append(t)
        i += 1
    # dedupe, keep order
    seen: set[str] = set()
    out = []
    for r in refs:
        if r.lower() not in seen:
            seen.add(r.lower())
            out.append(r)
    return out


def _bind(s_text: str, refs: list[str], row, dtypes) -> str:
    from duckdb_spark.relation import _sql_lit

    bound = s_text
    # longest first so `t1.ab` is replaced before an unqualified `ab`
    order = sorted(range(len(refs)), key=lambda k: -len(refs[k]))
    for k in order:
        ref = refs[k]
        lit = _sql_lit(row[k], dtypes[k]).replace("\\", "\\\\")
        if "." in ref:
            q, c = ref.split(".", 1)
            pat = rf"(?is)(?<![\w.]){re.escape(q)}\s*\.\s*{re.escape(c)}\b(?!\s*\.)"
        else:
            pat = rf"(?is)(?<![\w.]){re.escape(ref)}(?!\s*\()\b(?!\s*\.)"
        bound = re.sub(pat, lit, bound)
    return bound


def decorrelate_retry(con, query: str):
    """Flatten hard correlated subqueries; returns a Relation or None."""
    from duckdb_spark.sql.dialect import (
        _match_paren,
        _next_code,
        _prev_code,
        _tokens,
    )

    toks = _tokens(query)
    span = _outer_from_span(toks)
    if span is None:
        return None
    from duckdb_spark.sql.dialect import _nestcmp_from_tables

    outer_from_text = "".join(toks[span[0]:span[1]]).strip()
    outer_aliases = _nestcmp_from_tables(
        _tokens(f"FROM {outer_from_text}"))
    if not outer_aliases:
        return None
    outer_cols: dict[str, set[str]] = {}
    for alias, tbl in outer_aliases.items():
        cols = _columns_of(con.spark, tbl)
        if cols is None:
            return None  # unresolvable outer side: bail
        outer_cols[alias] = cols

    out = list(toks)
    changed = False
    i = 0
    while i < len(out):
        if out[i] != "(":
            i += 1
            continue
        sel = _next_code(out, i + 1)
        if sel >= len(out) or not (_word(out[sel]) and
                                   out[sel].upper() == "SELECT"):
            i += 1
            continue
        p = _prev_code(out, i - 1)
        prev_up = out[p].upper() if p >= 0 and _word(out[p]) else ""
        if prev_up in _OUTER_POS_GUARD:
            i += 1
            continue
        close = _match_paren(out, i)
        if close < 0:
            i += 1
            continue
        s_toks = out[i + 1:close]
        refs = _find_refs(s_toks, outer_aliases, outer_cols, con.spark)
        if refs is None:
            return None  # unsound shape anywhere: give up entirely
        if not refs:
            i = close + 1
            continue
        s_text = "".join(s_toks)
        # distinct outer keys
        keys_rel = con.sql(
            "SELECT DISTINCT " + ", ".join(
                f"{r} AS __k{k}" for k, r in enumerate(refs)
            ) + f" FROM {outer_from_text}"
        )
        if keys_rel is None:
            return None
        keys_df = keys_rel.df()
        key_rows = keys_df.limit(MAX_KEYS + 1).collect()
        if len(key_rows) > MAX_KEYS:
            return None
        dtypes = [f.dataType for f in keys_df.schema.fields]
        mode = "scalar"
        if prev_up == "EXISTS":
            mode = "exists"
        elif prev_up in ("IN", "ANY", "ALL", "SOME"):
            mode = "set"
        rows = []
        val_schema = None
        for row in key_rows:
            r = con.sql(_bind(s_text, refs, row, dtypes))
            if r is None:
                return None
            rdf = r.df()
            if mode == "exists":
                import pyspark.sql.types as T

                val_schema = T.StructType([T.StructField(
                    "__v", T.BooleanType())])
                rows.append(tuple(row) + (len(rdf.limit(1).collect()) > 0,))
                continue
            vals = rdf.collect()
            val_schema = rdf.schema
            if mode == "scalar":
                rows.append(
                    tuple(row) + ((vals[0][0],) if vals else (None,)))
            else:
                for vr in vals:
                    rows.append(tuple(row) + (vr[0],))
        import pyspark.sql.types as T

        if val_schema is None:
            return None
        vfield = (val_schema.fields[0] if mode != "exists"
                  else val_schema.fields[0])
        schema = T.StructType(
            list(keys_df.schema.fields)
            + [T.StructField("__v", vfield.dataType, True)]
        )
        _SEQ[0] += 1
        view = f"__dkcorr_{_SEQ[0]}"
        con.spark.createDataFrame(rows, schema).createOrReplaceTempView(
            view)
        cond = " AND ".join(
            f"{view}.__k{k} <=> ({r})" for k, r in enumerate(refs)
        )
        if mode == "exists":
            # replace `(S)` with a scalar boolean lookup; EXISTS( wraps it,
            # so emit the lookup as a derived value EXISTS can consume
            repl = (f"(SELECT 1 AS __one FROM {view} "
                    f"WHERE {cond} AND __v)")
        else:
            repl = f"(SELECT __v FROM {view} WHERE {cond})"
        out[i:close + 1] = _tokens(repl)
        changed = True
        i += 1
    if not changed:
        return None
    # ORDER BY ordinals get expanded to their select expression by the
    # null-order pass; a copied correlated lookup is NOT valid in ORDER BY
    # position (Sort sits above the Project). Alias subquery-bearing
    # select items and point the ordinals at the alias instead.
    sel_at = -1
    depth = 0
    for k, t in enumerate(out):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _word(t) and t.upper() == "SELECT":
            sel_at = k
            break
    fr_at = -1
    depth = 0
    for k in range(sel_at + 1, len(out)):
        t = out[k]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _word(t) and t.upper() == "FROM":
            fr_at = k
            break
    ob_at = -1
    depth = 0
    for k in range(len(out)):
        t = out[k]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _word(t) and t.upper() == "ORDER":
            ob_at = k
    if sel_at >= 0 and fr_at > sel_at and ob_at > fr_at:
        # split select items
        items: list[tuple[int, int]] = []
        st = sel_at + 1
        depth = 0
        for k in range(sel_at + 1, fr_at):
            t = out[k]
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            elif t == "," and depth == 0:
                items.append((st, k))
                st = k + 1
        items.append((st, fr_at))
        alias_of: dict[int, str] = {}
        for idx, (a, b) in enumerate(items):
            text = "".join(out[a:b])
            if not re.search(r"(?i)\bSELECT\b", text):
                continue
            m = re.search(r"(?is)\bAS\s+([A-Za-z_]\w*)\s*$", text.strip())
            if m:
                alias_of[idx + 1] = m.group(1)
            else:
                alias_of[idx + 1] = f"__dkord_{idx + 1}"
        # rewrite ordinals in ORDER BY, right-to-left isn't needed (text
        # swaps are same-length agnostic via token replace)
        k = _next_code(out, ob_at + 1)  # BY
        k = _next_code(out, k + 1)
        while k < len(out):
            t = out[k]
            if re.fullmatch(r"[1-9]\d*", t) and int(t) in alias_of:
                out[k] = alias_of[int(t)]
            if t == "(":
                c = _match_paren(out, k)
                if c < 0:
                    break
                k = c
            k += 1
        # inject the aliases (reverse order to keep spans valid)
        for idx in sorted(alias_of, reverse=True):
            a, b = items[idx - 1]
            if not re.search(r"(?is)\bAS\s+[A-Za-z_]\w*\s*$",
                             "".join(out[a:b]).strip()):
                out[b:b] = [" ", "AS", " ", alias_of[idx], " "]
    return con.sql("".join(out))
