#!/usr/bin/env python
"""Round-11 optimization measurement harness.

For each bench-tagged query (or an explicit list): run it noop-timed
(min-of-3, warm — the bench.py protocol) under the SAME session config as
bench.py, count Spark jobs for one materialization, and dump the FINAL
executed plan (AQE-final) plus explain("formatted") to
plans/r11/<query>_<label>.txt.

Usage:
    python tools/r11_measure.py --label before [query ...]
    python tools/r11_measure.py --label after --no-plans [query ...]

Timings print one JSON line per query so runs can be diffed mechanically.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from billing_data_pipeline_spark.registry import load_catalog  # noqa: E402
from billing_data_pipeline_spark.session import (  # noqa: E402
    dir_input_bytes,
    get_spark,
    input_sized_conf,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--label", default="before")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = args.plans_dir or os.path.join(root, "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    catalog = load_catalog()
    if args.queries:
        specs = {n: catalog[n] for n in args.queries}
    else:
        specs = {n: s for n, s in sorted(catalog.items()) if s.bench}

    spark = get_spark(
        app_name="bdp-r11-measure",
        extra_conf=input_sized_conf(dir_input_bytes(sf_dir)),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # No dim-table cache (r11): match bench.py's compute-from-parquet contract.

    results = {}
    for name, spec in specs.items():
        spark.sparkContext.setJobDescription(f"r11:{name}")
        best = float("inf")
        err = None
        df = None
        try:
            # warm run (codegen/JIT) then timed min-of-N
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            for run in range(args.runs):
                if run == args.runs - 1:
                    spark.sparkContext.setJobGroup(f"r11:{name}", name)
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                if run == args.runs - 1:
                    spark.sparkContext.setJobGroup("r11:idle", "")
            tracker = spark.sparkContext.statusTracker()
            n_jobs = len(tracker.getJobIdsForGroup(f"r11:{name}"))
        except Exception as exc:  # keep measuring the rest
            err = f"{type(exc).__name__}: {exc}"[:300]
            print(json.dumps({"query": name, "error": err}))
            continue
        row = {
            "query": name,
            "sec": round(best, 4),
            "n_jobs": n_jobs,
        }
        results[name] = row
        print(json.dumps(row), flush=True)
        if not args.no_plans and df is not None:
            path = os.path.join(plans_dir, f"{name}_{args.label}.txt")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            qe = df._jdf.queryExecution()
            with open(path, "w") as fh:
                fh.write(f"# {name} — {args.label} (sf_dir={sf_dir})\n")
                fh.write(
                    f"# noop-timed min-of-{args.runs}: {best:.4f}s, "
                    f"jobs={n_jobs}\n\n"
                )
                fh.write("== explain(formatted) ==\n")
                fh.write(buf.getvalue())
                fh.write("\n== executed plan (AQE-final) ==\n")
                fh.write(qe.executedPlan().toString())
    total = sum(r["sec"] for r in results.values())
    print(
        json.dumps(
            {"label": args.label, "total_sec": round(total, 4), "n": len(results)}
        )
    )


if __name__ == "__main__":
    main()
