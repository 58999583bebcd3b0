#!/usr/bin/env python
"""Dev helper: run individual sqllogictest files and print pass/fail reasons
WITHOUT touching the SQLLOGIC.json/SQLLOGIC.md scoreboard.

Usage: python scripts/sl_probe.py <path-relative-to-test/sql> [...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.environ.get("SQLLOGIC_REF", "/root/reference/test/sql")


def main() -> None:
    from duckdb_spark.session import get_spark
    from duckdb_spark.sqllogic import SLSession, run_file

    spark = get_spark(shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    for rel in sys.argv[1:]:
        path = rel if os.path.isabs(rel) else os.path.join(REF, rel)
        sess = SLSession(spark.newSession())
        try:
            r = run_file(sess, path)
            print(f"{r.status:5s} {rel}  {r.reason}")
        except Exception as e:  # noqa: BLE001
            print(f"CRASH {rel}  {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
