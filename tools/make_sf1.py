#!/usr/bin/env python
"""Deterministic sf1 (10x sf0.1) test-data generator.

Round 3 established sf1 as the scale-signal fixture (BENCH.md "10x data");
round 4 makes it the official bench.py snapshot scale, so the generator
moves into the repo for reproducibility. Recipe (all DuckDB, no Spark):

- PK/FK key-offset 10-copy scale-up: per-copy offsets keep join
  cardinality identical within each copy (10x rows, same per-key fanout).
- documents: per-copy BIJECTIVE letter rotation (translate a..z ->
  rotated a..z, same for A..Z). Char-shingle structure is preserved
  within a copy and ~disjoint across copies: near-dup pair output grows
  linearly (10x), not quadratically. (Naive text copies inflated
  MinHash near-dup pairs ~37,000x - exactly the fixture artifact a
  scale test must avoid; a per-word suffix changes shingle statistics.)
- embeddings: per-copy vector rotation (list_concat(v[i+1:], v[1:i])) -
  distinct geometry per copy, same norm, so ANN cell/bucket populations
  scale instead of collapsing onto 10 identical point sets.
- events: per-copy microsecond ts jitter + user_id offset so
  sessionization windows don't merge across copies.
- region/nation: tiny dims, copied untouched (FK targets).

Usage: python tools/make_sf1.py [dst] [src]   (defaults /tmp/sf1,
/root/testdata/sf0.1). Idempotent: skips when dst already has a
lineitem.parquet with exactly 10x the source rows.
"""

from __future__ import annotations

import os
import shutil
import string
import sys


def make_sf1(dst: str = "/tmp/sf1", src: str = "/root/testdata/sf0.1") -> str:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads=16")

    if os.path.exists(f"{dst}/lineitem.parquet"):
        try:
            n_src = con.execute(
                f"SELECT count(*) FROM '{src}/lineitem.parquet'"
            ).fetchone()[0]
            n_dst = con.execute(
                f"SELECT count(*) FROM '{dst}/lineitem.parquet'"
            ).fetchone()[0]
            if n_dst == 10 * n_src and os.path.exists(
                f"{dst}/documents.parquet"
            ):
                return dst
        except Exception:
            pass

    for t in ("region", "nation"):
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    copies = "SELECT * FROM range(10) r(i)"
    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    rot_cases = " ".join(
        f"WHEN i = {i} THEN translate(text, '{lower + upper}', "
        f"'{lower[i:] + lower[:i]}{upper[i:] + upper[:i]}')"
        for i in range(1, 10)
    )
    sels = {
        "customer": (
            "c_custkey + i*1000000 AS c_custkey, c_name, c_nationkey, "
            "c_acctbal, c_mktsegment"
        ),
        "supplier": (
            "s_suppkey + i*1000000 AS s_suppkey, s_name, s_nationkey, "
            "s_acctbal"
        ),
        "part": (
            "p_partkey + i*1000000 AS p_partkey, p_name, p_brand, p_type, "
            "p_size, p_retailprice"
        ),
        "orders": (
            "o_orderkey + i*10000000 AS o_orderkey, "
            "o_custkey + i*1000000 AS o_custkey, o_orderstatus, "
            "o_totalprice, o_orderdate, o_orderpriority"
        ),
        "lineitem": (
            "l_orderkey + i*10000000 AS l_orderkey, "
            "l_partkey + i*1000000 AS l_partkey, "
            "l_suppkey + i*1000000 AS l_suppkey, l_linenumber, l_quantity, "
            "l_extendedprice, l_discount, l_tax, l_returnflag, "
            "l_linestatus, l_shipdate"
        ),
        "events": (
            "event_id + i*10000000 AS event_id, "
            "ts + to_microseconds((i*977)::BIGINT) AS ts, "
            "user_id + i*1000000 AS user_id, event_type, value, props"
        ),
        "documents": (
            "doc_id + i*1000000 AS doc_id, "
            f"CASE WHEN i = 0 THEN text {rot_cases} END AS text, "
            "lang, source, n_chars"
        ),
        "embeddings": (
            "vec_id + i*1000000 AS vec_id, "
            "CASE WHEN i = 0 THEN embedding "
            "ELSE list_concat(embedding[i+1:], embedding[1:i]) "
            "END AS embedding, label"
        ),
    }
    for t, sel in sels.items():
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', ({copies}) "
            f"ORDER BY 1) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    return dst


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = make_sf1(dst, src)
    import duckdb

    con = duckdb.connect()
    for t in (
        "lineitem", "orders", "customer", "documents", "embeddings", "events"
    ):
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n)
