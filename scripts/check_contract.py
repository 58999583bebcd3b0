#!/usr/bin/env python
"""Driver-faithful contract check.

Replicates the grading driver's correctness gate more strictly than
tests/test_queries.py: Spark results via toPandas(), oracle via
duckdb .df(), columns sorted by name, rows sorted, and values compared
DTYPE-SENSITIVELY (an int64 column vs a float64 column fails even when
numerically equal — that is exactly the HUGEINT/float64 failure mode the
fetchall-based suite can't see; see CORRECTNESS_r01 dedup_simhash).

Usage: python scripts/check_contract.py [sf_dir] [first_n]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and __name__ == "__main__" else "/root/testdata/sf0.01"
# arg2: first-N count, "all", or a comma-separated list of query names
_SEL = sys.argv[2] if len(sys.argv) > 2 and __name__ == "__main__" else "50"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def render(v) -> str:
    """Canonical string rendering of one cell — the unit the driver's
    value-hash consumes. NO numeric coercion: Decimal('23.70') must render
    '23.70' and FAIL against float 23.7's '23.7' exactly like the driver
    does (VERDICT r07 item 1 — the old float()-with-tolerance compare here
    signed off two rounds of 50/50 that the driver failed)."""
    import datetime

    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass  # arrays/lists: pd.isna is ambiguous
    # Spark DATE → datetime.date; DuckDB DATE → Timestamp at midnight. The
    # driver treats these as equal (r01 fn_date_batch green with DATE
    # columns), so midnight timestamps render as their date.
    if isinstance(v, pd.Timestamp):
        return str(v.date()) if v == v.normalize() else str(v)
    if isinstance(v, datetime.datetime):
        return str(v.date()) if v.time() == datetime.time() else str(v)
    # numpy scalars render like their python equivalents
    if hasattr(v, "item") and getattr(v, "shape", None) in ((), None):
        try:
            v = v.item()
        except (ValueError, AttributeError):
            pass
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ", ".join(render(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {render(x)}" for k, x in v.items()) + "}"
    return str(v)


def cells_equal(a, b) -> bool:
    return render(a) == render(b)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        # default 1g heap dies on the exact-percentile queries at the sf1
        # fixture (holistic buffering); value-irrelevant, survival only
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_CHECK_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    # Single-threaded oracle (ADVICE r12): the reference-exact folds replay
    # DuckDB's sequential accumulation; a multi-threaded oracle combines
    # per-thread states in nondeterministic order on any fixture whose
    # groups span row groups/files, making bit-identity compares flaky.
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet{'/*.parquet' if os.path.isdir(f'{SF_DIR}/{t}.parquet') else ''}')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    if _SEL == "all":
        names = list(qs)
    elif _SEL.isdigit():
        names = list(qs)[: int(_SEL)]
    else:
        names = [n for n in _SEL.split(",") if n in qs]
    bad = []
    for name in names:
        t0 = time.time()
        try:
            s = canon(qs[name](spark, SF_DIR).toPandas())
            if name not in osql:
                print(f"{name:28s} rows_only rows={len(s)} ({time.time()-t0:.1f}s)")
                continue
            o = canon(con.execute(osql[name]).df())
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"{name:28s} ERROR {str(e).splitlines()[-1][:120]}")
            continue
        status = []
        if list(s.columns) != [c.lower() for c in o.columns] and list(s.columns) != list(o.columns):
            status.append(f"cols {list(s.columns)} != {list(o.columns)}")
        if len(s) != len(o):
            status.append(f"rows {len(s)} != {len(o)}")
        if not status:
            for c_s, c_o in zip(s.columns, o.columns):
                ks, ko = s[c_s].dtype.kind, o[c_o].dtype.kind
                if {ks, ko} == {"i", "f"}:
                    status.append(f"dtype {c_s}: {s[c_s].dtype} vs {o[c_o].dtype}")
                    break
            else:
                for i in range(len(s)):
                    srow, orow = s.iloc[i], o.iloc[i]
                    for c_s, c_o in zip(s.columns, o.columns):
                        if not cells_equal(srow[c_s], orow[c_o]):
                            status.append(
                                f"row {i} col {c_s}: {srow[c_s]!r} != {orow[c_o]!r}"
                            )
                            break
                    if status:
                        break
        if status:
            bad.append(name)
            print(f"{name:28s} FAIL {status[0]} ({time.time()-t0:.1f}s)")
        else:
            print(f"{name:28s} ok rows={len(s)} ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(bad)}/{len(names)} pass; failing: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
