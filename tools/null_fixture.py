#!/usr/bin/env python
"""Build adversarial copies of a testdata dir for full-catalog sweeps.

Usage:
    python tools/null_fixture.py [src_dir] [dst_dir]         # NULL injection
    python tools/null_fixture.py --dups [src_dir] [dst_dir]  # duplicate keys/ts
    python tools/null_fixture.py --empty [src_dir] [dst_dir] # zero-row tables
    python tests/driver_sim.py <dst_dir>                     # the sweep

--dups duplicates ~10% of events at the SAME (user_id, ts) under new
event ids (double-fire) and re-appends some lineitem natural-key rows —
the class that breaks any window ordered by ts without an id tiebreak
and any ASOF with unresolved right-side ties (165/165 green round 3
after the tiebreak hardening).

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from billing_data_pipeline_spark.sources.tables import TABLES  # noqa: E402

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


def build_empty(src: str, dst: str) -> str:
    """Schema-preserving ZERO-ROW copies of every table — the graceful-
    degradation sweep (165/165 green round 3 after empty guards in the
    ANN/k-means seeding, the stream-flush sentinel anchor, and HAVING
    n > 0 on the grouping-set queries — on empty input DuckDB emits the
    standard's grand-total row while Spark emits none)."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' WHERE 1=0) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    return dst


def build_dups(src: str, dst: str) -> str:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id, ts, user_id, event_type, value, props
                  FROM '{src}/events.parquet'
                  UNION ALL
                  SELECT event_id + 1000000, ts, user_id,
                         CASE WHEN event_id % 3 = 0 THEN 'click'
                              ELSE event_type END,
                         value + 1.0, props
                  FROM '{src}/events.parquet' WHERE event_id % 10 = 0
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (
                  SELECT * FROM '{src}/lineitem.parquet'
                  UNION ALL
                  SELECT * FROM '{src}/lineitem.parquet'
                  WHERE l_orderkey % 50 = 0
                ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dups = "--dups" in sys.argv[1:]
    empty = "--empty" in sys.argv[1:]
    src = args[0] if args else "/root/testdata/sf0.001"
    default_dst = (
        "/tmp/duptest_sf" if dups else
        "/tmp/emptytest_sf" if empty else "/tmp/nulltest_sf"
    )
    dst = args[1] if len(args) > 1 else default_dst
    builder = build_dups if dups else build_empty if empty else build
    print("wrote", builder(src, dst))
