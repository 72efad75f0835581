#!/usr/bin/env python
"""Row-level Spark-vs-oracle diff for one catalog query on any fixture dir.

Usage: python tools/diff_query.py <query_name> [sf_dir] [max_rows]

Prints rows present on only one side (canonicalized like the driver's
value hash), for debugging sweep mismatches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.driver_sim import _cell  # noqa: E402


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(tuple(_cell(r[i]) for i in order) for r in rows), [
        cols[i] for i in order
    ]


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/extremetest_sf"
    max_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    import __spark_entry__ as e
    from billing_data_pipeline_spark.session import get_spark
    from billing_data_pipeline_spark.sources.tables import duckdb_connect

    spark = get_spark(shuffle_partitions=8)
    df = e.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in df.collect()]
    scols = [f.name for f in df.schema.fields]
    con = duckdb_connect(sf_dir)
    res = con.execute(e.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    sc, cols = canon(scols, srows)
    oc, _ = canon(ocols, orows)
    sset, oset = set(sc), set(oc)
    print(f"{name}: spark={len(sc)} oracle={len(oc)} cols={cols}")
    only_s = sorted(sset - oset)[:max_rows]
    only_o = sorted(oset - sset)[:max_rows]
    print(f"spark-only ({len(sset - oset)}):")
    for r in only_s:
        print("  S", r)
    print(f"oracle-only ({len(oset - sset)}):")
    for r in only_o:
        print("  O", r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
