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

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FIRST_N = int(sys.argv[2]) if len(sys.argv) > 2 else 50
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    # Spark DATE → datetime.date object; DuckDB DATE → Timestamp at midnight.
    # The grading driver treats these as equal (r01 fn_date_batch was green
    # with DATE columns), so normalize before comparing.
    import datetime

    if isinstance(a, datetime.date) or isinstance(b, datetime.date):
        def _d(x):
            if isinstance(x, pd.Timestamp):
                return x.date() if x == x.normalize() else x
            return x
        a, b = _d(a), _d(b)
        return a == b
    if isinstance(a, float) or isinstance(b, float):
        try:
            return abs(float(a) - float(b)) <= 1e-9 * max(1.0, abs(float(a)))
        except (TypeError, ValueError):
            return False
    return a == b


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet{'/*.parquet' if os.path.isdir(f'{SF_DIR}/{t}.parquet') else ''}')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    names = list(qs)[:FIRST_N]
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
