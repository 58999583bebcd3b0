#!/usr/bin/env python
"""Generate scaled benchmark data by replicating the sf0.1 fixture K times
with key-space offsets that preserve FK relationships and join/group
selectivities (region/nation stay fixed, like TPC-H).

The driver only ships sf{0.001,0.01,0.1}; the BASELINE protocol requires
sf1/sf10 measurements, so we scale the fixture ourselves. Row multipliers
follow TPC-H semantics: fact tables (customer/supplier/part/orders/
lineitem) scale linearly; the auxiliary corpora (events/documents/
embeddings) scale too so the pipeline benchmarks grow with SF.

Usage: python scripts/gen_scaled_sf.py <K> <out_dir>   # K=10 → sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    k = int(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    strides = {}
    for t, key in [
        ("customer", "c_custkey"), ("supplier", "s_suppkey"), ("part", "p_partkey"),
        ("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
        ("events", "event_id"), ("documents", "doc_id"), ("embeddings", "vec_id"),
    ]:
        strides[t] = con.execute(
            f"SELECT MAX({key}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
    # user_id space in events must also stride so session/window partitions scale
    strides["user"] = con.execute(
        f"SELECT MAX(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]

    copies = f"(SELECT UNNEST(generate_series(0, {k - 1})) AS i)"

    def gen(table: str, select: str) -> None:
        # Write a DIRECTORY of k files (one per replica index) — a single
        # monolithic file would give a distributed reader one scan split,
        # which benchmarks the file layout, not the engine.
        os.makedirs(f"{out}/{table}.parquet", exist_ok=True)
        for i in range(k):
            con.execute(
                f"COPY (SELECT {select} FROM read_parquet('{SRC}/{table}.parquet'), "
                f"(SELECT {i} AS i)) "
                f"TO '{out}/{table}.parquet/part_{i:04d}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
            )
        print(table, con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet/*.parquet')").fetchone()[0])

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    gen("customer", f"c_custkey + i * {strides['customer']} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    gen("supplier", f"s_suppkey + i * {strides['supplier']} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    gen("part", f"p_partkey + i * {strides['part']} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
    gen("orders", f"o_orderkey + i * {strides['orders']} AS o_orderkey, "
                  f"o_custkey + i * {strides['customer']} AS o_custkey, "
                  f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem", f"l_orderkey + i * {strides['orders']} AS l_orderkey, "
                    f"l_partkey + i * {strides['part']} AS l_partkey, "
                    f"l_suppkey + i * {strides['supplier']} AS l_suppkey, "
                    f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
                    f"l_returnflag, l_linestatus, l_shipdate")
    gen("events", f"event_id + i * {strides['events']} AS event_id, ts, "
                  f"user_id + i * {strides['user']} AS user_id, event_type, value, props")
    gen("documents", f"doc_id + i * {strides['documents']} AS doc_id, "
                     # perturb replicated text so dedup workloads don't explode
                     # into k-fold duplicate clusters: append a replica marker
                     f"CASE WHEN i = 0 THEN text ELSE text || ' replica_' || i END AS text, "
                     f"lang, source, n_chars")
    gen("embeddings", f"vec_id + i * {strides['embeddings']} AS vec_id, embedding, label")


if __name__ == "__main__":
    main()
