#!/usr/bin/env python
"""Driver-faithful contract check for SPECIFIC query names (same compare
as scripts/check_contract.py, but takes names instead of first-N).

Usage: python scripts/check_names.py name1 name2 ... [--sf=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_contract import TABLES, canon, cells_equal  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)

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
        sub = "/*.parquet" if os.path.isdir(f"{sf_dir}/{t}.parquet") else ""
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet{sub}')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    bad = []
    for name in names:
        t0 = time.time()
        try:
            s = canon(qs[name](spark, sf_dir).toPandas())
            if name not in osql:
                print(f"{name:28s} rows_only rows={len(s)} ({time.time()-t0:.1f}s)")
                continue
            o = canon(con.execute(osql[name]).df())
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            msg = str(e).splitlines()
            print(f"{name:28s} ERROR {' | '.join(m[:160] for m in msg[:3])}")
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
