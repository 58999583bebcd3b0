#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query,query,...]
Writes plans/r12/<query>_<tag>.txt (tag = before/after). Uses the sf1
bench fixture when present (the gate scale) so plan shapes match the
benched data; falls back to $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_spark import queries as q
from duckdb_spark.session import get_spark

DEFAULT = [
    "tpch_q01", "tpch_q03", "tpch_q05", "tpch_q06", "tpch_q08", "tpch_q09",
    "tpch_q13", "tpch_q18", "tpch_q21",
    "win_topk_per_group", "ev_timeseries", "ev_asof_join",
    "dedup_minhash_lsh", "text_quality", "sim_cosine_topk",
    "tpcds_q07", "tpcds_q25", "cb_q12", "cb_q32",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT
    sf1 = "/tmp/duckdb_spark_bench_sf1"
    sf_dir = sf1 if os.path.exists(os.path.join(sf1, ".complete")) else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q.load_all()
    spark = get_spark(app_name="capture_plans")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_TAG", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in q.QUERIES:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        df = q.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({tag}), data: {sf_dir}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
