#!/usr/bin/env python
"""Single-query oracle parity gate for the r11 optimization loop.

Usage: python tools/r11_parity.py <query> [<query> ...] [--sf DIR ...]

Runs each named catalog query on Spark and its oracle on DuckDB at each
fixture dir (default sf0.01 AND sf0.1) and compares row count, schema and
the driver's order-insensitive value hash — the same gate driver_sim
applies to the full catalog, scoped to the queries under optimization."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["TZ"] = "UTC"
time.tzset()

from tests.driver_sim import value_hash  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sfs: list[str] = []
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sfs.append(next(it))
        else:
            names.append(a)
    if not sfs:
        sfs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from billing_data_pipeline_spark.registry import load_catalog
    from billing_data_pipeline_spark.session import get_spark
    from billing_data_pipeline_spark.sources.tables import duckdb_connect

    catalog = load_catalog()
    spark = get_spark(shuffle_partitions=8)
    bad = 0
    for sf_dir in sfs:
        con = duckdb_connect(sf_dir)
        for name in names:
            spec = catalog[name]
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            rows = df.collect()
            cols = [f.name for f in df.schema.fields]
            if not spec.oracle:
                print(f"{sf_dir} {name}: rows-only ({len(rows)})")
                continue
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            ok = (
                len(rows) == len(orows)
                and sorted(c.lower() for c in cols)
                == sorted(c.lower() for c in ocols)
                and value_hash(cols, [tuple(r) for r in rows])
                == value_hash(ocols, orows)
            )
            # bench_baseline_sql must stay result-identical too
            extra = ""
            if ok and spec.bench_baseline_sql:
                from billing_data_pipeline_spark.plans._util import (
                    de_instrument_sql,
                )

                res2 = con.execute(de_instrument_sql(spec.bench_baseline_sql))
                bcols = [d[0] for d in res2.description]
                brows = res2.fetchall()
                ok = value_hash(bcols, brows) == value_hash(ocols, orows)
                extra = " (+bench twin)"
            status = "MATCH" + extra if ok else "FAIL"
            bad += 0 if ok else 1
            print(
                f"{sf_dir} {name}: {status} ({len(rows)} rows)"
                f" [{time.time()-t0:.1f}s]"
            )
        con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
