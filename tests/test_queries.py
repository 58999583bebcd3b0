"""Differential test: every registered query vs the DuckDB oracle.

This is the same gate the driver runs (CORRECTNESS_r{N}.json), at sf0.001
for speed. Queries without an oracle entry get a rows-only smoke check.
"""

from __future__ import annotations

import pytest

from duckdb_spark import queries as q
from tests.conftest import SF_DIR, assert_matches_oracle

q.load_all()

WITH_ORACLE = sorted(n for n in q.QUERIES if n in q.ORACLE)
ROWS_ONLY = sorted(n for n in q.QUERIES if n not in q.ORACLE)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle, name):
    df = q.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, oracle, q.ORACLE[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_query_runs(spark, name):
    df = q.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_no_driver_unstable_output_types(spark):
    """Registry-wide gate (VERDICT r07 item 1b): no registered query may
    return a DECIMAL output column. The driver's value-hash renders Spark's
    Decimal('23.70') differently from DuckDB's pandas float 23.7, so raw
    DECIMAL passthrough fails the hash even when every value is numerically
    identical (tpcds_q12/q20/q65/q98, rounds 6-7). Schema inspection is
    analysis-only — no execution."""
    from pyspark.sql.types import DecimalType

    bad = []
    for name, fn in q.QUERIES.items():
        try:
            df = fn(spark, SF_DIR)
        except Exception:  # noqa: BLE001 — runnability is the other tests' job
            continue
        decs = [f.name for f in df.schema.fields
                if isinstance(f.dataType, DecimalType)]
        if decs:
            bad.append(f"{name}: DECIMAL output column(s) {decs} — "
                       "CAST(... AS DOUBLE) in both query and oracle")
    assert not bad, "\n".join(bad)


def test_every_oracle_parses(oracle):
    """Cheap syntactic gate: every registered oracle must at least be
    parseable by DuckDB (EXPLAIN, no execution). Guards against committing
    a query that was never run (tpcds_q02, round 6)."""
    bad = []
    for name, sql in q.ORACLE.items():
        try:
            oracle.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {e}")
    assert not bad, "\n".join(bad)
