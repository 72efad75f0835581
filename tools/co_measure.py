#!/usr/bin/env python
"""Co-measured Spark-vs-DuckDB crossover at scaled data dirs.

The scale probe (tools/scale_probe.py) shows Spark's growth SHAPE; this
tool adds the DuckDB side at the same scaled dirs so a crossover claim is
measured, not extrapolated (VERDICT r6 #2: the exact-percentile tier had a
Spark-only curve). Method identical to the r6 tf-idf/decontaminate tables:
same scaled dirs, the query's own registered oracle SQL (de-instrumented —
run verbatim through duckdb_connect's views), min-of-3 warm on both
engines, Spark terminal = noop sink full materialization (what bench.py
times), DuckDB terminal = fetchall.

Usage:
  python tools/co_measure.py QUERY[,QUERY...] [mult ...]
  (default mults: 1 8 32)
"""

from __future__ import annotations

import os
import sys
import shutil
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from billing_data_pipeline_spark.plans._util import de_instrument_sql
from billing_data_pipeline_spark.registry import load_catalog
from billing_data_pipeline_spark.session import (
    dir_input_bytes,
    get_spark,
    input_sized_conf,
)
from billing_data_pipeline_spark.sources.tables import duckdb_connect
from tools.scale_probe import SF_DIR, build_scaled_dir


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else ["usage_percentiles"]
    mults = [int(a) for a in sys.argv[2:]] or [1, 8, 32]
    catalog = load_catalog()
    for n in names:
        spec = catalog[n]
        if (spec.bench_baseline_sql or spec.oracle) is None:
            raise SystemExit(f"{n} has no oracle SQL — nothing to co-measure")
    root = tempfile.mkdtemp(prefix="co_measure_")
    try:

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        # ONE SESSION PER MULT, conf'd for that mult's actual input size
        # (ADVICE r7 / VERDICT #9): the old single session took
        # input_sized_conf for the LARGEST mult, so small-mult Spark walls
        # carried oversized-shuffle scheduling overhead — the x1 column
        # read ~2x worse than bench.py's same-query wall. Per-mult
        # sessions make every column bench-protocol-identical; the extra
        # cost is one JVM context spin-up per mult.
        cells: dict[tuple[str, int], str] = {}
        base_bytes = dir_input_bytes(SF_DIR)
        for m in mults:
            spark = get_spark(
                app_name=f"bdp-co-measure-x{m}",
                extra_conf=input_sized_conf(base_bytes * m),
            )
            d = build_scaled_dir(spark, m, SF_DIR, root)
            for name in names:
                entry = catalog[name]
                # same rule as bench.py: time bench_baseline_sql when the
                # correctness oracle deliberately runs a different
                # algorithm, and strip the parity-only STRING->DECIMAL
                # instrumentation (it costs DuckDB 10-100x on scan-heavy
                # sums — timing it would inflate the crossover in Spark's
                # favor; review r7)
                sql = de_instrument_sql(entry.bench_baseline_sql or entry.oracle)
                noop(entry.fn(spark, d))  # warm: codegen + page cache
                s_best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    noop(entry.fn(spark, d))
                    s_best = min(s_best, time.perf_counter() - t0)
                con = duckdb_connect(d)
                try:
                    # Arrow fetch, not fetchall: full materialization
                    # without per-row Python tuple cost — the same
                    # terminal bench.py and audit_plans.py time, so
                    # crossover tables stay comparable across rounds
                    con.execute(sql).fetch_arrow_table()  # warm
                    d_best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        con.execute(sql).fetch_arrow_table()
                        d_best = min(d_best, time.perf_counter() - t0)
                finally:
                    con.close()
                cells[(name, m)] = (
                    f"{s_best:.2f} / {d_best:.2f} ({s_best / d_best:.2f}x)"
                )
            spark.stop()

        header = "| Query | " + " | ".join(
            f"x{m} Spark / DuckDB (ratio)" for m in mults
        ) + " |"
        print(header)
        print("|---|" + "---|" * len(mults))
        for name in names:
            print(
                f"| `{name}` | "
                + " | ".join(cells[(name, m)] for m in mults)
                + " |",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
