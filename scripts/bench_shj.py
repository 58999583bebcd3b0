#!/usr/bin/env python
"""SHJ-vs-SMJ flip measurement (VERDICT r03 #1 / r04 next-round #2).

Times the three queries the r03 regression implicated — tpch_q21, tpch_q18,
win_topk_per_group — with spark.sql.join.preferSortMergeJoin set both ways,
interleaved A/B within one session (flag is runtime-settable) so host drift
hits both arms equally. n rounds per (query, flag); medians printed.

Usage: python scripts/bench_shj.py <sf_dir> [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["tpch_q21", "tpch_q18", "win_topk_per_group", "tpch_q03", "tpch_q05"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from duckdb_spark import queries as q
    from duckdb_spark.session import get_spark

    q.load_all()
    spark = get_spark(app_name="bench_shj")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warmup

    results: dict[str, dict[str, list[float]]] = {
        name: {"shj": [], "smj": []} for name in QUERIES
    }
    # one untimed warmup per (query, flag) to pay codegen once
    for flag, key in (("false", "shj"), ("true", "smj")):
        spark.conf.set("spark.sql.join.preferSortMergeJoin", flag)
        for name in QUERIES:
            q.QUERIES[name](spark, sf_dir).collect()
    for _ in range(rounds):
        for flag, key in (("false", "shj"), ("true", "smj")):
            spark.conf.set("spark.sql.join.preferSortMergeJoin", flag)
            for name in QUERIES:
                t0 = time.perf_counter()
                q.QUERIES[name](spark, sf_dir).collect()
                results[name][key].append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2]

    summary = {
        name: {
            "shj_median": med(r["shj"]),
            "smj_median": med(r["smj"]),
            "shj_all": r["shj"],
            "smj_all": r["smj"],
        }
        for name, r in results.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, "queries": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
