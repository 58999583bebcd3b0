#!/usr/bin/env python
"""Run the reference sqllogictest corpus through our engine and write a
scoreboard (SQLLOGIC.json + SQLLOGIC.md).

Usage:
    python scripts/run_sqllogic.py [subdir ...] [--workers N] [--limit N]

Subdirs are relative to the reference's test/sql/; default is the curated
set from SURVEY §5(a). Files are distributed over N worker threads, each
with its own SparkSession (spark.newSession() — separate temp-view
catalog on one shared JVM/SparkContext), which is exactly how concurrent
clients share a Spark cluster.

A skip-list (tests/sqllogic_skiplist.json) records files that are out of
scope with a reason; they count as 'skip', never as 'pass'.
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.environ.get("SQLLOGIC_REF", "/root/reference/test/sql")
DEFAULT_SUBDIRS = [
    "aggregate", "window", "cte", "join/asof", "join/inner", "join/natural",
    "join/cross_product", "join/left_outer", "join/full_outer",
    "join/hash_join", "join/iejoin", "join/mark", "order", "limit", "filter",
    "select", "conjunction", "subquery/scalar", "subquery/exists",
    "subquery/any_all", "types/list", "types/struct", "types/map",
    "types/null", "cast", "setops",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    workers = 8
    limit = None
    for a in sys.argv[1:]:
        if a.startswith("--workers"):
            workers = int(a.split("=")[1])
        if a.startswith("--limit"):
            limit = int(a.split("=")[1])
    subdirs = args or DEFAULT_SUBDIRS

    from duckdb_spark.session import get_spark
    from duckdb_spark.sqllogic import FileResult, SLSession, run_file

    skiplist_path = os.path.join(os.path.dirname(__file__), "..", "tests", "sqllogic_skiplist.json")
    skiplist: dict[str, str] = {}
    if os.path.exists(skiplist_path):
        skiplist = json.load(open(skiplist_path))

    files: list[str] = []
    for sub in subdirs:
        base = os.path.join(REF, sub)
        if os.path.isfile(base):
            files.append(base)
            continue
        for dirpath, _, names in sorted(os.walk(base)):
            files.extend(
                os.path.join(dirpath, n) for n in sorted(names) if n.endswith(".test")
            )
    if limit:
        files = files[:limit]

    base_spark = get_spark(shuffle_partitions=2)
    base_spark.sparkContext.setLogLevel("ERROR")

    q: queue.Queue[str] = queue.Queue()
    for f in files:
        q.put(f)
    results: list[FileResult] = []
    lock = threading.Lock()
    t0 = time.time()

    def worker() -> None:
        sess = SLSession(base_spark.newSession())
        while True:
            try:
                path = q.get_nowait()
            except queue.Empty:
                return
            key = os.path.relpath(path, REF)
            if key in skiplist:
                r = FileResult(key, "skip", skiplist[key])
            else:
                try:
                    r = run_file(sess, path)
                except Exception as e:  # noqa: BLE001 - runner crash != file fail
                    r = FileResult(key, "fail", f"runner: {type(e).__name__}: {e}")
                r.path = key
            with lock:
                results.append(r)
                n = len(results)
                if n % 25 == 0:
                    print(f"[{n}/{len(files)}] {time.time()-t0:.0f}s", flush=True)

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    results.sort(key=lambda r: r.path)
    counts = Counter(r.status for r in results)
    print(f"\n== {counts['pass']} pass / {counts['fail']} fail / "
          f"{counts['skip']} skip of {len(results)} in {time.time()-t0:.0f}s")

    # Failure histogram by normalized reason (for targeted dialect fixes).
    def norm(reason: str) -> str:
        r = reason.split(":", 2)[-1].strip() if "line" in reason[:5] else reason
        return r[:90]

    hist = Counter(norm(r.reason) for r in results if r.status == "fail")
    for reason, n in hist.most_common(30):
        print(f"{n:4d}  {reason}")

    files_out = {r.path: {"status": r.status, "reason": r.reason}
                 for r in results}
    # merge is the DEFAULT: a subset run must never truncate the corpus
    # scoreboard (pass --no-merge for a from-scratch rebuild)
    if "--no-merge" not in sys.argv and os.path.exists("SQLLOGIC.json"):
        # update only the rows this invocation ran — lets targeted
        # re-runs refresh their files without a full-corpus pass
        prev = json.load(open("SQLLOGIC.json"))["files"]
        prev.update(files_out)
        files_out = prev
        counts = Counter(v["status"] for v in files_out.values())
        print(f"== merged scoreboard: {counts['pass']} pass / "
              f"{counts['fail']} fail / {counts['skip']} skip of "
              f"{len(files_out)}")
    out = {
        "total": len(files_out), "pass": counts["pass"],
        "fail": counts["fail"], "skip": counts["skip"],
        "files": files_out,
    }
    json.dump(out, open("SQLLOGIC.json", "w"), indent=1)
    with open("SQLLOGIC.md", "w") as fh:
        fh.write("# SQLLOGIC — reference sqllogictest corpus vs this engine\n\n")
        fh.write(f"Generated by scripts/run_sqllogic.py over {REF}\n\n")
        fh.write(f"**{counts['pass']} pass / {counts['fail']} fail / "
                 f"{counts['skip']} skip** of {len(files_out)} files\n\n")
        fh.write("| file | status | reason |\n|---|---|---|\n")
        for path in sorted(files_out):
            v = files_out[path]
            reason = v["reason"][:140].replace("|", "/")
            fh.write(f"| {path} | {v['status']} | {reason} |\n")
    print("wrote SQLLOGIC.json / SQLLOGIC.md")


if __name__ == "__main__":
    main()
