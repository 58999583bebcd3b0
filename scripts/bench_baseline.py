#!/usr/bin/env python
"""Measure the DuckDB baseline for the bench.py headline queries.

Runs each headline query's ORACLE SQL on DuckDB over the same parquet
files bench.py reads, with the same protocol (1 warmup + 1 timed run),
and prints one JSON line. Results are recorded in BASELINE.md — the
BASELINE protocol requires *measured same-host numbers*, not citations.

Usage: python scripts/bench_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    from bench import HEADLINE
    from duckdb_spark import queries as q

    q.load_all()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet{'/*.parquet' if os.path.isdir(f'{SF_DIR}/{t}.parquet') else ''}')"
        )
    # TPC-DS / ClickBench fixtures scale with sf (VERDICT r05 item 2): the
    # registered oracles bake the base (~sf0.01) fixture path; substitute the
    # scaled directory so DuckDB reads the same data bench.py's Spark run does.
    from duckdb_spark.queries import bench_scale_mult, clickbench, tpcds

    mult = bench_scale_mult(SF_DIR)
    subs = {}
    if mult > 1 and any(n.startswith(("tpcds_", "cb_")) for n in HEADLINE):
        subs[tpcds.fixture_dir(1)] = tpcds.ensure_fixture(mult)
        subs[clickbench.fixture_dir(1)] = clickbench.ensure_fixture(mult)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in q.ORACLE:
            continue
        sql = q.ORACLE[name]
        for base, scaled in subs.items():
            sql = sql.replace(base + "/", scaled + "/")
        con.execute(sql).fetchall()  # warmup
        samples = []
        for _ in range(3):  # median of 3, matching bench.py's protocol
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
