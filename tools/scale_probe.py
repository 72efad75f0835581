#!/usr/bin/env python
"""Scale probe: run headline queries at 1x/2x/4x/8x the sf0.1 fact data and
report wall time + marginal cost per million rows.

This measures the claim PLANS.md makes qualitatively: Spark's per-job floor
is constant in data size, so once the input outgrows the floor, cost grows
~linearly with rows while the PLAN stays identical (same exchanges, same
join strategies — dims stay broadcast as the fact side scales). The fact
table (lineitem) is scaled by unioning key-shifted copies; every other
table is the original, exactly how a growing warehouse behaves.

Usage: python tools/scale_probe.py [multiplier ...]   (default 1 2 4 8)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from billing_data_pipeline_spark.registry import load_catalog
from billing_data_pipeline_spark.session import (
    dir_input_bytes,
    get_spark,
    input_sized_conf,
)
from billing_data_pipeline_spark.sources.tables import TABLES, load_table

SF_DIR = os.path.abspath(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)  # symlinks below must not resolve relative to the temp dir
# lineitem-dominated queries: two pure scans/agg, one percentile, one
# dim-broadcast join — the shapes whose scaling matters.
PROBE_QUERIES = (
    "daily_aggregates",
    "discounted_revenue",
    "usage_percentiles",
    "shipping_priority",
    "price_quantity_regression",  # power sums: pure map-side combine
    "returnflag_multiset_ops",    # EXCEPT/INTERSECT ALL rewrite
    "doc_top_terms_tfidf",        # vocab job + exchange-free Arrow kernel
    "decontaminate_ngram",        # broadcast eval grams, train never shuffled
    "heavy_hitter_terms",         # exact Misra-Gries, threshold-bounded state
    "latest_event_per_user",      # QUALIFY dedup window over events
    "purchase_last_click_asof",   # as-of join, user-key exchange
    "exact_dedup_docs",           # md5 groupBy dedup
    # r4 (VERDICT r3 #6): the ANN/k-means family gets a growth curve too —
    # recall floors guard quality, these guard the runtime shape.
    "embedding_ivf_topk",         # stride seed + bucketed IVF probe join
    "embedding_lsh_neardup_pairs",  # hyperplane-LSH band join
    "embedding_kmeans_step",      # one assign+recenter Lloyd round
    # r4: the two floor-dominated bench rows (43x / 14x DuckDB ratios at
    # sf0.1) get growth curves — the floor defense needs the curve, not
    # just the decomposition.
    "streaming_tumbling_catchup",  # one-micro-batch AvailableNow drain
    "incremental_status_rollup_cdc",  # diff join + delta fold
    # r4 late: the reworked portable-MinHash bench row (Arrow sig kernel +
    # sig-through-the-band-join) — its ~3x-at-sf0.1 ratio is floor-heavy,
    # the curve shows where the md5-for-md5 crossover lands.
    "minhash_neardup_pairs_portable",
)


def build_scaled_dir(spark, mult: int, base: str, root: str) -> str:
    """{root}/x{mult}: lineitem = mult key-shifted copies; other tables
    symlinked to the originals."""
    out = os.path.join(root, f"x{mult}")
    os.makedirs(out, exist_ok=True)
    scale_keys = {
        "lineitem": "l_orderkey",
        "orders": "o_orderkey",  # r4: gives the CDC snapshot-diff a curve
        "documents": "doc_id",
        "events": "event_id",
        "embeddings": "vec_id",
    }
    for t in TABLES:
        if t not in scale_keys:
            os.symlink(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    # lineitem.l_orderkey and orders.o_orderkey are an FK pair: both
    # MUST shift by the SAME stride or copy i's lineitems join copy i's
    # orders only when the two tables' maxes coincide (review r5 —
    # latent: testdata regenerates between rounds). One shared stride for
    # the orderkey group, computed as the max over both tables.
    shared_stride: dict[str, int] = {}
    fk_groups = {"l_orderkey": "orderkey", "o_orderkey": "orderkey"}
    for t, key in scale_keys.items():
        if key in fk_groups:
            df = spark.read.parquet(f"{base}/{t}.parquet")
            mx = df.agg(F.max(key)).collect()[0][0]
            g = fk_groups[key]
            shared_stride[g] = max(shared_stride.get(g, 0), (mx or 0) + 1)
    for t, key in scale_keys.items():
        df = spark.read.parquet(f"{base}/{t}.parquet")
        if key in fk_groups:
            stride = shared_stride[fk_groups[key]]
        else:
            mx = df.agg(F.max(key)).collect()[0][0]
            stride = (mx or 0) + 1  # empty table: stride 1, copies no-op
        copies = [
            df.withColumn(key, F.col(key) + F.lit(i * stride))
            for i in range(mult)
        ]
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    catalog = load_catalog()
    root = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        # Conf sized for the LARGEST multiplier so every run shares one
        # session (cross-scale comparability beats per-scale tuning here).
        spark = get_spark(
            app_name="bdp-scale-probe",
            extra_conf=input_sized_conf(dir_input_bytes(SF_DIR) * max(mults)),
        )
        dirs = {m: build_scaled_dir(spark, m, SF_DIR, root) for m in mults}
        rows = {
            m: spark.read.parquet(f"{d}/lineitem.parquet").count()
            for m, d in dirs.items()
        }
        print(f"| Query | " + " | ".join(f"x{m} ({rows[m]/1e6:.1f}M rows)" for m in mults) + " |")
        print("|---|" + "---|" * len(mults))
        # bench.py's terminal operator: full materialization via the noop
        # sink (count() lets Catalyst prune value columns from the timed
        # plan — the probe must measure the same work the bench does)
        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        only = {
            q for q in os.environ.get(
                "SPARK_GRAFT_PROBE_QUERIES", ""
            ).split(",") if q
        }
        for name in PROBE_QUERIES:
            if only and name not in only:
                continue
            fn = catalog[name].fn
            cells = []
            for m in mults:
                noop(fn(spark, dirs[m]))  # warm (codegen + page cache)
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    noop(fn(spark, dirs[m]))
                    best = min(best, time.perf_counter() - t0)
                cells.append(f"{best:.2f}s")
            print(f"| `{name}` | " + " | ".join(cells) + " |")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
