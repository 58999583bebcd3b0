"""WITH RECURSIVE driver loop (SURVEY.md §2.7).

Reference: `src/execution/operator/set/physical_recursive_cte.cpp` —
iterate: working table → recursive step → dedupe against accumulated
result; stop when the step yields no new rows (UNION semantics) or no rows
(UNION ALL semantics).

Spark has no WITH RECURSIVE; the idiomatic pattern is a driver-side loop
with `localCheckpoint()` per iteration to truncate lineage (otherwise the
plan tree grows exponentially). The per-iteration `count()` action is the
fixpoint test — unavoidable in any engine (DuckDB's executor does the same
check on its intermediate table sizes).

Scale: each iteration is a distributed join/union; the accumulated result
stays partitioned. `max_iterations` bounds runaway cycles like DuckDB's
(implicit) resource limits.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    distinct: bool = True,
    max_iterations: int = 100,
) -> DataFrame:
    """Evaluate WITH RECURSIVE: base UNION [ALL] step(working) fixpoint.

    `distinct=True` ≡ UNION (dedupe, terminate when no *new* rows);
    `distinct=False` ≡ UNION ALL (terminate when step yields no rows).
    """
    acc = base.localCheckpoint(eager=True)
    working = acc
    for _ in range(max_iterations):
        nxt = step(working)
        if distinct:
            nxt = nxt.exceptAll(acc).distinct()
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return acc
        acc = acc.unionByName(nxt).localCheckpoint(eager=True)
        working = nxt
    raise RuntimeError(f"recursive_cte: no fixpoint after {max_iterations} iterations")
