"""[EXT] Distribution statistics: exact percentiles, histograms, and the
sketch-based scale variants.

The reference's analytics stop at SUM/AVG/COUNT (pipeline/assets/
aggregates.py:34-48 computes exactly those); real billing dashboards ask
"what does the p95 user pay" and "what does the usage distribution look
like" next, so the engine ships them:

- exact tier (oracle-checked): `percentile()` — Spark's sort-based exact
  interpolated quantile, same linear-interpolation definition as DuckDB's
  `quantile_cont`, verified hash-identical; histogram binning via explicit
  floor(x / width) arithmetic (dialect-neutral, one IEEE division both
  engines).
- scale tier (rows-only): `approx_percentile` — a single-pass, mergeable
  KLL-style sketch. Exact percentile requires a per-group sort that at
  100 TB means a massive shuffle of raw values; the sketch reduces that to
  map-side partial sketches merged at reduce, constant memory per group —
  the same exact-vs-mergeable tradeoff as countDistinct vs HLL (SURVEY.md
  §7 "What is hard" #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregates import exact_sum
from ..registry import register
from ._util import dsum_sql, t

PCTS = (0.5, 0.9, 0.95, 0.99)


@register(
    "usage_percentiles",
    tags=("ext", "stats", "percentile"),
    bench=True,
    oracle=f"""
SELECT l_returnflag,
       {", ".join(f"quantile_cont(l_extendedprice, {p}) AS p{int(p * 100)}" for p in PCTS)}
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def usage_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p90/p95/p99 of the price measure per group.

    One shuffle of (flag, value) pairs clustered by group key, then one
    Arrow kernel per group: numpy sorts the group's values and reads the
    two bracketing ranks per percentile. Two earlier formulations, each
    measured at sf0.1 under full materialization: Spark's `percentile`
    aggregate (per-call value buffers, 3.9 s) and a window row_number +
    bracketing-rank sum (1.1 s — the external sort runs two window
    passes over the group). The kernel does the same single sort in numpy
    without the second pass or the 600k-row conditional sum: 0.68 s.

    Value parity (hash-gated): the kernel reproduces DuckDB
    quantile_cont's OWN interpolation expression — 0-based RN = (n-1)*q,
    result = v[floor(RN)]*(ceil(RN)-RN) + v[ceil(RN)]*(RN-floor(RN)),
    equal-ranks short-circuit to the exact element (review r5: the
    previous 1-based pos = 1+(n-1)*q and (1-f)*lo + f*hi form drifted a
    ulp on 107 of 8000 random group/percentile trials — the +1.0 perturbs
    frac across binades and (1-f)*a+f*b is a different IEEE expression
    than a*(c-r)+b*(r-f); this form measured 0 of 8000). The TPC-H
    fixtures masked it because cent-granular prices usually tie the two
    bracketing values. numpy's sort on float64 is a total order here
    (NULLs filtered before the kernel).

    Scale contract: EVERY exact per-group quantile puts the whole group
    through one task — Window.partitionBy does too (hash clustering, one
    task per key) — so the parallelism unit is the group either way; the
    window form trades this kernel's in-memory numpy sort for a spillable
    external sort at ~1.7x the time. At 100 TB group sizes use
    usage_percentiles_approx (mergeable KLL-style sketches, map-side
    combine) — or bracket ranks over a repartitionByRange two-phase rank
    if exactness is non-negotiable."""
    import numpy as np
    import pandas as pd

    li = t(spark, sf_dir, "lineitem")
    schema = "l_returnflag string, " + ", ".join(
        f"p{int(p * 100)} double" for p in PCTS
    )

    def kernel(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        import math

        # NULL measures drop INSIDE the kernel, never before the groupBy:
        # a pre-groupBy filter deleted any group whose measures are ALL
        # NULL, while the oracle's GROUP BY keeps it with NULL
        # percentiles (review r6, reproduced: an all-NULL-price
        # returnflag made Spark emit 3 rows vs the oracle's 4).
        v = np.sort(pdf["v"].dropna().to_numpy())
        n = len(v)
        out = {"l_returnflag": [key[0]]}
        for p in PCTS:
            if n == 0:
                out[f"p{int(p * 100)}"] = [None]  # quantile of no values
                continue
            rn = (n - 1) * p
            frn, crn = math.floor(rn), math.ceil(rn)
            if frn == crn:
                res = v[int(rn)]
            else:
                res = v[frn] * (crn - rn) + v[crn] * (rn - frn)
            out[f"p{int(p * 100)}"] = [float(res)]
        return pd.DataFrame(out)

    return (
        li.select("l_returnflag", F.col("l_extendedprice").alias("v"))
        .groupBy("l_returnflag")
        .applyInPandas(kernel, schema)
        .orderBy("l_returnflag")
    )


@register("usage_percentiles_approx", tags=("ext", "stats", "approx"))
def usage_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch tier: approx_percentile at accuracy 10000 (~0.01% rank error).
    Mergeable partial sketches replace the per-group value sort — map-side
    combine works, shuffle carries sketches not raw doubles. Rows-only
    (sketch output is implementation-defined); usage_percentiles is the
    exact baseline."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(
                    f"approx_percentile(l_extendedprice, {p}, 10000)"
                ).alias(f"p{int(p * 100)}")
                for p in PCTS
            ]
        )
        .orderBy("l_returnflag")
    )


HIST_WIDTH = 5000.0


@register(
    "usage_histogram",
    tags=("ext", "stats", "histogram"),
    oracle=f"""
SELECT CAST(floor(l_extendedprice / {HIST_WIDTH}) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('l_extendedprice')} AS total
FROM lineitem
GROUP BY bucket
ORDER BY bucket
""",
)
def usage_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the price measure: bucket = floor(x/width)
    (one IEEE division, identical both engines — deliberately not
    width_bucket, which DuckDB lacks). One hash-agg shuffle keyed on ~24
    buckets; at scale bucket count stays constant so this is pure map-side
    combine with a tiny exchange."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.floor(F.col("l_extendedprice") / HIST_WIDTH).alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            exact_sum("l_extendedprice")
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )


@register(
    "event_value_deciles",
    tags=("ext", "stats", "percentile", "ntile"),
    oracle=f"""
WITH ranked AS (
    SELECT user_id, value,
           ntile(10) OVER (ORDER BY value, event_id) AS decile
    FROM events WHERE value IS NOT NULL
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('value')} AS total
FROM ranked GROUP BY decile ORDER BY decile
""",
)
def event_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile assignment via ntile over a deterministic total order
    (value, event_id tiebreak), then per-decile mass — the "who is in the
    top 10%" question. Scale note: a global ntile is a single-partition
    sort; at 100 TB swap in approx_percentile cutpoints + a range join
    (the sketch tier), keeping this exact form for report-sized inputs."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.orderBy(F.col("value"), F.col("event_id"))
    return (
        ev.select("user_id", "value", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            exact_sum("value").cast("double").alias("total"),
        )
        .orderBy("decile")
    )


@register("event_value_deciles_scalable", tags=("ext", "stats", "approx", "scale-path"))
def event_value_deciles_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB decile path promised by event_value_deciles: cutpoints
    from a mergeable approx_percentile sketch (one aggregate, no global
    sort), broadcast as a one-row array, and each row's decile assigned by
    a fold over the 9 cutpoints — fully distributed, no single-partition
    window, no driver round-trip. Sketch cutpoints => rows-only;
    event_value_deciles is the exact twin."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    qs = [i / 10 for i in range(1, 10)]
    cuts = ev.agg(
        F.expr(
            f"approx_percentile(value, array({','.join(map(str, qs))}), 10000)"
        ).alias("cuts")
    )
    return (
        ev.crossJoin(F.broadcast(cuts))
        .select(
            "value",
            (
                F.aggregate(
                    F.col("cuts"),
                    F.lit(1),
                    lambda acc, c: acc + F.when(F.col("value") > c, 1).otherwise(0),
                )
            ).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            exact_sum("value").cast("double").alias("total"),
        )
        .orderBy("decile")
    )


@register(
    "price_quantity_regression",
    tags=("ext", "stats", "regression", "correlation"),
    oracle=f"""
WITH s AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           {dsum_sql('l_quantity')} AS sx,
           {dsum_sql('l_extendedprice')} AS sy,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sxy,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sxx,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS syy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
       (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr,
       (n * sxy - sx * sy) / (CAST(n AS DOUBLE) * n) AS covar_pop
FROM s
""",
)
def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS regression + Pearson correlation + population
    covariance of (quantity -> extendedprice), computed from exact-decimal
    POWER SUMS (Σx, Σy, Σxy, Σx², Σy²) rather than Spark's built-in
    corr/covar_samp — the built-ins accumulate co-moments in shuffle order
    (nondeterministic doubles), while decimal power sums are associative,
    so every statistic is one fixed IEEE expression over identical
    operands on both engines. The shuffle carries 5 decimals + a count per
    group: a 100 TB regression costs exactly what a SUM costs, and the
    same five sums serve slope, intercept, r, and covariance without a
    second pass.

    Cross-engine trap avoided here: casting a PRODUCT of doubles to
    decimal is NOT portable — Spark rounds the shortest-string repr,
    DuckDB the binary value, and they disagree once the product carries a
    full mantissa (found empirically on sum(y*y)). So each FACTOR is cast
    to DECIMAL(19,6) — lossless for this data (prices carry 2 decimals) —
    and multiplied in exact decimal arithmetic: the product never exists
    as a double. 19 digits also forces int128 physical decimals in DuckDB,
    whose int64 decimal multiplication overflows (errors) at width 15."""
    li = t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")

    def prod_sum(a, b):
        return F.sum(a.cast("decimal(19,6)") * b.cast("decimal(19,6)"))

    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        exact_sum(x).cast("double").alias("sx"),
        exact_sum(y).cast("double").alias("sy"),
        prod_sum(x, y).cast("double").alias("sxy"),
        prod_sum(x, x).cast("double").alias("sxx"),
        prod_sum(y, y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_num = n * sxy - sx * sy
    slope = cov_num / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (
            cov_num / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr"),
        (cov_num / (n.cast("double") * n)).alias("covar_pop"),
    )
