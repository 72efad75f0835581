#!/usr/bin/env python
"""Worktree A/B: the documented ratio-walker exoneration protocol
(PLANS.md r8/r9 tables), packaged so it stops being re-improvised.

Cross-round bench walls are NOT comparable (box drift: both engines
slow together) — a per-query ratio that "walked" between rounds is a
REGRESSION only if the old code, run TODAY on the same box, beats the
new code. This tool measures exactly that:

- `git worktree add <tmp> <old-commit>` (caller passes the commit);
- per side per round: a FRESH python/JVM in that tree (sessions can't
  span code trees), bench.py's focused harness — session warm-up,
  cached dimension tables, per-query adjacent warm, min-of-5 timed runs
  to the noop sink — plus the min-of-5 trivial-scan calibration probe
  so sides can be load-normalized;
- sides alternate NEW/OLD for `--rounds` rounds (default 3); round 1 is
  warm-up by protocol (page cache, JIT) — the table marks it.

Usage:
  python tools/ab_worktree.py OLD_COMMIT q1[,q2...] [--rounds 3] [--sf DIR]

Prints a per-round table and a verdict line per query: REGRESSION when
new is slower than old by >15% in EVERY steady round, BOX otherwise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sf_dir, queries = sys.argv[1], sys.argv[2].split(",")
from billing_data_pipeline_spark.registry import load_catalog
from billing_data_pipeline_spark.session import (
    get_spark, dir_input_bytes, input_sized_conf,
)

spark = get_spark(
    app_name="bdp-ab", extra_conf=input_sized_conf(dir_input_bytes(sf_dir))
)
spark.range(1_000_000).selectExpr("sum(id)").collect()
# no dim-table cache: the r11 bench contract computes from parquet inputs
catalog = load_catalog()

floor = float("inf")
fdf = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
for _ in range(5):
    t0 = time.perf_counter()
    fdf.write.format("noop").mode("overwrite").save()
    floor = min(floor, time.perf_counter() - t0)

out = {"floor": round(floor, 5), "queries": {}}
for q in queries:
    fn = catalog[q].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out["queries"][q] = round(best, 4)
print("ABRESULT " + json.dumps(out))
"""


def run_side(tree: str, sf_dir: str, queries: list[str]) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, sf_dir, ",".join(queries)],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT ") :])
    raise RuntimeError(
        f"runner in {tree} produced no result:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )


def main() -> None:
    # accept both `--rounds 3` and `--rounds=3` (review r10: the usage
    # string documented the space form but only `=` parsed — IndexError)
    rounds = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--rounds") or a.startswith("--sf"):
            if "=" in a:
                key, val = a.split("=", 1)
            else:
                key = a
                i += 1
                if i >= len(argv):
                    raise SystemExit(f"{key} needs a value")
                val = argv[i]
            if key == "--rounds":
                rounds = int(val)
            else:
                sf_dir = val
        else:
            args.append(a)
        i += 1
    if len(args) < 2:
        raise SystemExit(__doc__)
    old_commit, queries = args[0], args[1].split(",")

    load = os.getloadavg()[0]
    print(f"# 1-min loadavg at start: {load:.2f}"
          + (" — LOADED, numbers suspect" if load > 0.5 else ""))

    wt = tempfile.mkdtemp(prefix="ab_worktree_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, old_commit],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        results: list[tuple[int, str, dict]] = []
        for rnd in range(1, rounds + 1):
            for side, tree in (("NEW", REPO), ("OLD", wt)):
                res = run_side(tree, sf_dir, queries)
                results.append((rnd, side, res))
                qs = " ".join(
                    f"{q}={res['queries'][q]:.3f}s" for q in queries
                )
                tag = " (warm-up)" if rnd == 1 else ""
                print(f"# round {rnd} {side}{tag}: floor={res['floor']:.4f} {qs}")
        print()
        print("| query | side | " + " | ".join(f"r{r}" for r in range(1, rounds + 1)) + " |")
        print("|---|---|" + "---|" * rounds)
        for q in queries:
            for side in ("NEW", "OLD"):
                cells = [
                    f"{res['queries'][q]:.3f}"
                    for rnd, s, res in results
                    if s == side
                ]
                print(f"| {q} | {side} | " + " | ".join(cells) + " |")
        # verdict over steady rounds (2..n)
        for q in queries:
            steady_new = [
                res["queries"][q] for rnd, s, res in results if s == "NEW" and rnd > 1
            ]
            steady_old = [
                res["queries"][q] for rnd, s, res in results if s == "OLD" and rnd > 1
            ]
            if not steady_new or not steady_old:
                continue
            regression = all(
                n > 1.15 * o for n, o in zip(steady_new, steady_old)
            )
            verdict = "REGRESSION" if regression else "BOX (old == new within spread)"
            print(
                f"VERDICT {q}: {verdict} — new min {min(steady_new):.3f}s,"
                f" old min {min(steady_old):.3f}s"
            )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            capture_output=True,
        )


if __name__ == "__main__":
    main()
