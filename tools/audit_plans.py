#!/usr/bin/env python
"""Physical-plan audit tool — the re-runnable source of PLANS.md's tables.

Usage:
    python tools/audit_plans.py [query ...]          # plan features per query
    python tools/audit_plans.py --bench              # warm Spark vs DuckDB timings
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1          # data (default sf0.1)

For each query: executes it (so AQE finalizes), then reports the plan
features that constitute the scale contract — join strategies, exchange
count, TakeOrderedAndProject, reused exchanges, pushed filters and pruned
read schemas. With --bench, times every bench-tagged query warm on both
engines and prints the comparison table in PLANS.md's format.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from billing_data_pipeline_spark.registry import load_catalog  # noqa: E402
from billing_data_pipeline_spark.session import get_spark  # noqa: E402

FEATURES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "TakeOrderedAndProject",
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "ReusedExchange",
    "Window",
    "Generate explode",
    "StreamingSymmetricHashJoin",
)


def audit(names: list[str], sf_dir: str) -> None:
    # SAME session sizing as bench.py (review r5): below 1 GiB the bench
    # runs AQE-off with static partitions — auditing under get_spark's
    # AQE-on defaults described plans the bench never executes
    from billing_data_pipeline_spark.session import (
        dir_input_bytes,
        input_sized_conf,
    )

    spark = get_spark(
        app_name="bdp-plan-audit",
        extra_conf=input_sized_conf(dir_input_bytes(sf_dir)),
    )
    cat = load_catalog()
    for name in names:
        spec = cat[name]
        df = spec.fn(spark, sf_dir)
        # finalize THIS dataframe's adaptive plan: df.count() is a
        # SEPARATE QueryExecution and left df's own plan un-executed
        # (isFinalPlan=false), misreporting AQE join switches — verified
        # live: 1 BroadcastHashJoin reported where the final plan has 2
        # (review r5). The noop write executes df itself.
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        feats = [
            f"{p}x{n}" for p in FEATURES if (n := len(re.findall(p, plan)))
        ]
        print(f"{name} | {', '.join(feats)}")
        # toString() truncates long scan lines mid-bracket: accept an
        # unterminated filter list too, or real pushdown goes unreported
        for p in sorted(set(re.findall(r"PushedFilters: \[[^\]\n]*\]?", plan))):
            if p != "PushedFilters: []":
                print(f"    {p[:160]}")
        for p in sorted(set(re.findall(r"ReadSchema: struct<[^>]{0,120}", plan))):
            print(f"    {p[:160]}")


def bench_compare(sf_dir: str) -> None:
    from billing_data_pipeline_spark.session import dir_input_bytes, input_sized_conf
    from billing_data_pipeline_spark.sources.tables import duckdb_connect

    spark = get_spark(
        app_name="bdp-plan-audit",
        extra_conf=input_sized_conf(dir_input_bytes(sf_dir)),
    )
    # No dim-table cache (r11): match bench.py's compute-from-parquet contract.
    cat = load_catalog()
    con = duckdb_connect(sf_dir)  # threads = Spark's parallelism — fair ratio
    print("| Query | Spark s | DuckDB s | ratio |")
    print("|---|---|---|---|")
    tot_s = tot_d = 0.0
    from billing_data_pipeline_spark.plans._util import de_instrument_sql

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name, spec in sorted(cat.items()):
        if not spec.bench:
            continue
        # bench.py's exact protocol: min-of-3 warm runs on BOTH engines
        # (single-shot sub-second numbers carry ±0.2-0.5 s of noise), FULL
        # materialization on both sides — Spark noop sink (count() would
        # let Catalyst prune aggregate expressions out of the timed plan),
        # DuckDB full Arrow fetch — and the de-instrumented natural SQL
        # (the parity-only STRING->DECIMAL shim costs DuckDB 10-100x).
        noop(spec.fn(spark, sf_dir))
        s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            noop(spec.fn(spark, sf_dir))
            s = min(s, time.perf_counter() - t0)
        baseline_sql = spec.bench_baseline_sql or spec.oracle
        if baseline_sql:
            # tot_s only accumulates co-measured rows (review r5: a
            # rows-only bench query would inflate the Spark total with no
            # DuckDB twin in tot_d, skewing the labeled comparison)
            tot_s += s
            baseline_sql = de_instrument_sql(baseline_sql)
            con.execute(baseline_sql).fetch_arrow_table()
            d = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(baseline_sql).fetch_arrow_table()
                d = min(d, time.perf_counter() - t0)
            tot_d += d
            print(f"| `{name}` | {s:.2f} | {d:.2f} | {s / d:.1f}× |")
        else:
            print(f"| `{name}` | {s:.2f} | — (rows-only) | — |")
    print(f"\nTotals (oracle-checked set): Spark {tot_s:.2f} s, DuckDB {tot_d:.2f} s")


if __name__ == "__main__":
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    if args and args[0] == "--bench":
        bench_compare(sf)
    else:
        names = args or sorted(load_catalog())
        audit(names, sf)
