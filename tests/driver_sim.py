"""Driver-contract simulation: the exact consumer path.

Fresh python -> import __spark_entry__ -> entry(spark) smoke -> for each
queries() name run Spark at sf0.01 and its oracle_sql() in DuckDB over the
same parquet views, then compare row count + order-insensitive stringified
value hash (lowercase/sorted columns, sorted row tuples, md5). No float
tolerance — this mirrors the driver's CORRECTNESS gate.

Usage: python tests/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime):
        if v.tzinfo is not None:  # convert to UTC BEFORE dropping tz
            from datetime import timezone

            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    canon = sorted(tuple(_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    # Pin the process timezone BEFORE the JVM starts: PySpark's non-Arrow
    # collect() converts TimestampType through datetime.fromtimestamp() in
    # the OS-local zone (the UTC *session* timezone doesn't apply to that
    # conversion), while DuckDB's fetchall returns naive UTC wall times —
    # on a non-UTC machine every timestamp hash would mismatch spuriously.
    os.environ["TZ"] = "UTC"
    try:
        time.tzset()
    except AttributeError:  # non-POSIX platform
        pass

    import __spark_entry__ as e
    from billing_data_pipeline_spark.session import get_spark
    from billing_data_pipeline_spark.sources.tables import duckdb_connect

    spark = get_spark(shuffle_partitions=8)

    smoke = e.entry(spark)
    n = len(smoke.collect())
    assert n > 0 and len(smoke.schema.fields) > 0
    print(f"entry(): {n} rows OK")

    oracles = e.oracle_sql()
    con = duckdb_connect(sf_dir)
    # the rows-only-EMPTY rule only applies when there is input to drain
    input_has_rows = (
        con.execute("SELECT count(*) FROM events").fetchone()[0]
        + con.execute("SELECT count(*) FROM lineitem").fetchone()[0]
    ) > 0

    failures = []
    for name, fn in sorted(e.queries().items()):
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
        except Exception as exc:  # collect every failure in one sweep pass
            msg = str(exc).split("\n")[0][:200]
            failures.append((name, f"ERR {type(exc).__name__}: {msg}"))
            print(f"  {name}: ERR {type(exc).__name__}: {msg} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        cols = [f.name for f in df.schema.fields]
        if name not in oracles:
            if not rows and input_has_rows:
                # A rows-only query that drains empty is the known silent
                # failure shape (symlinked-dir stream listing zero files,
                # broken seeding): every rows-only catalog entry returns
                # >0 rows at sf0.01 by construction, so 0 is a failure —
                # EXCEPT on the --empty fixture, where 0 rows is the
                # correct aggregate of zero input (r5: the rule false-
                # positived on usage_percentiles_approx there).
                failures.append((name, "ROWS-ONLY EMPTY (0 rows)"))
                print(f"  {name}: ROWS-ONLY EMPTY [{time.time()-t0:.1f}s]")
            else:
                print(f"  {name}: rows-only ({len(rows)} rows) "
                      f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # oracle-side crash: report, keep sweeping
            msg = str(exc).split("\n")[0][:200]
            failures.append((name, f"ORACLE-ERR {type(exc).__name__}: {msg}"))
            print(f"  {name}: ORACLE-ERR {type(exc).__name__}: {msg} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        status = []
        if len(rows) != len(orows):
            status.append(f"rowcount spark={len(rows)} oracle={len(orows)}")
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            status.append(f"schema spark={sorted(cols)} oracle={sorted(ocols)}")
        if not status:
            sh = value_hash(cols, [tuple(r) for r in rows])
            oh = value_hash(ocols, orows)
            if sh != oh:
                status.append("value-hash MISMATCH")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"  {name}: FAIL {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            print(f"  {name}: MATCH ({len(rows)} rows) [{time.time()-t0:.1f}s]")

    con.close()
    print(f"\n{len(e.queries())} queries, {len(failures)} failures")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
