#!/usr/bin/env python
"""Plan audit over ALL registered queries (guide §1.3): flag Python
boundary nodes (BatchEvalPython/ArrowEvalPython), CartesianProduct,
BroadcastNestedLoopJoin, and count Exchange/parquet-scan nodes per query.

Usage: python scripts/audit_plans.py [sf_dir] > plans/r12/AUDIT_all.txt
Analysis only — no query execution (recursive-CTE driver loops excepted,
since their plans are built by running the frontier loop).
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_spark import queries as q
from duckdb_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FLAGS = ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
         "BroadcastNestedLoopJoin")

# The reference-exact folds (functions/aggregates.py) are interpreted
# per-group array replays, contained to unbenched parity queries. The
# expression prints as a bare `aggregate(` (higher-order function) in the
# plan — HashAggregate/SortAggregate/ObjectHashAggregate all carry a
# letter before "aggregate", so the pattern only matches the HOF. A HOF
# aggregate alone is NOT the hazard (sim_cosine_topk's dot product folds a
# fixed-length per-ROW array and beat the unrolled codegen form 4× in the
# r13 A/B); the hazard is a fold over a PER-GROUP collect_list buffer, so
# the flag requires both.
_FOLD_RE = re.compile(r"[^A-Za-z_]aggregate\(")


def _fold_hazard(plan: str) -> bool:
    return bool(_FOLD_RE.search(plan)) and "collect_list(" in plan


def main() -> None:
    q.load_all()
    import bench

    headline = set(bench.HEADLINE)
    spark = get_spark(app_name="audit_plans")
    rows, errors = [], []
    fold_in_headline = []
    for name, fn in q.QUERIES.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            errors.append((name, repr(e)))
            continue
        flags = [f for f in FLAGS if f in plan]
        if name in headline and _fold_hazard(plan):
            flags.append("FOLD_IN_HEADLINE")
            fold_in_headline.append(name)
        nex = len(re.findall(r"\bExchange\b", plan))
        nscan = len(re.findall(r"Scan parquet|FileScan parquet", plan))
        rows.append((name, nex, nscan, ",".join(flags) or "-"))
    rows.sort(key=lambda r: (-len(r[3].replace("-", "")), -r[1]))
    print(f"# plan audit over {len(rows)} queries at {SF_DIR}")
    print(f"# {'query':28s} exchanges scans flags")
    for name, nex, nscan, flags in rows:
        print(f"{name:30s} {nex:3d} {nscan:3d}  {flags}")
    for name, err in errors:
        print(f"ERROR {name}: {err[:200]}")
    if fold_in_headline:
        print(f"FAIL: interpreted fold lambda in HEADLINE plan(s): "
              f"{','.join(fold_in_headline)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
