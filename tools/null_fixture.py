#!/usr/bin/env python
"""Build a NULL-injected copy of a testdata dir and (optionally) sweep it.

Usage:
    python tools/null_fixture.py [src_dir] [dst_dir]
    python tests/driver_sim.py <dst_dir>     # the sweep

Injects NULLs into ~10% of rows of every non-key column (keys and join
columns stay intact), then the driver-contract simulation hash-compares
every catalog query against its oracle on that data. Round 3 this sweep
found: a NULL_MAP_KEY crash, an MLlib HashingTF NPE (Catalyst reorders
UDF predicates ahead of null filters), zero-signature SimHash pairing all
null docs, per-column last(ignorenulls) splitting an as-of row, NULLS
FIRST/LAST lag-chain divergence, concat_ws-vs-|| null-element divergence.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

NULLABLE = {
    "events": ["value", "props", "event_type"],
    "documents": ["text", "lang", "source"],
    "lineitem": ["l_shipdate", "l_comment"],
    "orders": ["o_comment", "o_clerk"],
    "customer": ["c_mktsegment", "c_comment"],
    "part": ["p_comment"],
    "supplier": ["s_comment"],
    "nation": ["n_comment"],
    "region": ["r_comment"],
    "embeddings": ["label"],
}
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build(src: str, dst: str) -> str:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        exprs = [
            (
                f"CASE WHEN hash(rowid_x || '{c}') % 10 = 0 THEN NULL "
                f"ELSE {c} END AS {c}"
                if c in NULLABLE.get(t, [])
                else c
            )
            for c in cols
        ]
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM ("
            f"SELECT *, row_number() OVER () AS rowid_x "
            f"FROM '{src}/{t}.parquet')) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET)"
        )
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nulltest_sf"
    print("wrote", build(src, dst))
