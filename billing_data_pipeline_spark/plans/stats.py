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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.aggregates import exact_sum
from ..registry import register
from ._util import dsum_sql, t

PCTS = (0.5, 0.9, 0.95, 0.99)

# one-shot flag for the size-estimate seam warning (see usage_percentiles)
_SIZE_SEAM_WARNED = False


def _tag(p: float) -> int:
    """Column tag for percentile p: round, not int() — int(0.29*100)
    truncates to 28 (review r7); the oracle f-strings share this helper
    so engine and SQL can never disagree on a column name."""
    return round(p * 100)


def _interp(v_lo: float, v_hi: float, rn: float, frn: int, crn: int) -> float:
    """DuckDB quantile_cont's OWN interpolation expression, shared by the
    bracket tier and the kernel fallback (review r7: two hand-maintained
    copies of the one expression the r5 ulp-audit blessed — 0/8000 drift
    for THIS form, 107/8000 for an equivalent-looking variant — invited
    silent divergence between the tier and its exactness net)."""
    if frn == crn:
        return float(v_lo)
    return float(v_lo * (crn - rn) + v_hi * (rn - frn))


@register(
    "usage_percentiles",
    tags=("ext", "stats", "percentile"),
    bench=True,
    oracle=f"""
SELECT l_returnflag,
       {", ".join(f"quantile_cont(l_extendedprice, {p}) AS p{_tag(p)}" for p in PCTS)}
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def usage_percentiles(
    spark: SparkSession, sf_dir: str, *, bracket_min_bytes: int = 12 << 20
) -> DataFrame:
    """Exact interpolated p50/p90/p95/p99 of the price measure per group,
    computed WITHOUT ever shuffling raw values (r7 rework).

    Tier dispatch: inputs whose column-pruned Catalyst estimate is under
    ``bracket_min_bytes`` (~4x sf0.1) run the r6 per-group kernel — at
    that size one shuffle into whole-group numpy sorts is faster than
    two scans + a sketch, and group-per-task memory is a non-issue.
    Larger inputs take the bracket plan below. Both tiers are
    hash-exact against quantile_cont (each sweep-verified), so the
    dispatch can never change results, only the physical plan.

    The r6 plan (one applyInPandas kernel per group) was exact but its
    parallelism unit was the group: 3 returnflag groups meant 3 tasks
    sorting ~6M doubles each at x32 while 29 cores idled, and the whole
    measure column crossed the wire into Python (16.5 s at x32 vs
    DuckDB's parallel-sort 4.2 s — co-measured, PLANS.md r7). This form
    is the classic two-pass sketch-bracketed exact quantile:

    - job 1 (one scan, map-side combine): per group, COUNT(v) and a
      Greenwald-Khanna sketch probed at p ± 5/ACCURACY — rank error is
      ≤ n/ACCURACY, so the two probe values bracket every target rank
      with ≥ 4n/ACC slack. Collect (groups × 8 doubles).
    - job 2 (one scan + broadcast-joined brackets, codegen'd conditional
      aggs): per group and percentile, COUNT(v < lo), COUNT(v = lo),
      COUNT(v = hi), and collect_list(v WHERE lo < v < hi) — the strict
      window holds only the ≤ 10n/ACC values between the brackets
      (duplicates of the bracket endpoints themselves are carried as
      COUNTS, so a pathological all-equal group contributes ZERO window
      rows, not n). r12 (guide §5, VERDICT r11 item 5): the needed
      order statistics are SELECTED IN THE JVM — a post-aggregate
      projection (groups-sized input) picks element_at(sorted window,
      rank − below − eq_lo) for the ≤ 2 ranks each percentile needs, so
      the collect ships O(groups × pcts) scalars instead of the whole
      O(groups × n/ACCURACY) window arrays. (The item-5 "fold both jobs
      into one two-output aggregate" is impossible as stated: job 2's
      predicates are data-dependent on job 1's brackets, so two scans
      are inherent to the sketch-bracket algorithm; what WAS avoidable
      is the window crossing to the driver.)
    - driver: reconstruct the exact order statistics v[floor(RN)],
      v[ceil(RN)] from below/eq_lo/n_strict/eq_hi plus the JVM-selected
      window elements and interpolate. If a rank falls outside its
      bracket (sketch guarantee violated — never observed; possible
      only through GK implementation drift), fall back to the r6
      per-group kernel (`_usage_percentiles_kernel`), trading speed for
      unconditional exactness.

    Value parity (hash-gated): order statistics are exact data values,
    and the interpolation reproduces DuckDB quantile_cont's OWN
    expression — 0-based RN = (n-1)*q, result = v[floor(RN)]*(ceil(RN)-RN)
    + v[ceil(RN)]*(RN-floor(RN)), equal-ranks short-circuit to the exact
    element (review r5: the 1-based/(1-f)*lo+f*hi form drifted 1 ulp on
    107/8000 trials; this form 0/8000). All-NULL-measure groups emit NULL
    percentiles but KEEP their row (review r6); NULL group keys join
    null-safe.

    Scale contract: both jobs are full scans with map-side partial
    aggregation — parallelism is the partition count, not the group
    count; the shuffle carries sketches and counters, never values. The
    driver copy is O(groups × pcts) scalars (r12; the ≤ 10n/ACC window
    arrays stay executor-side, their size still tunable via ACCURACY —
    10k default ⇒ ~0.1% of each group per aggregation buffer). This is the
    exactness-at-scale tier; usage_percentiles_approx remains the
    single-pass sketch tier when ±0.01% rank error is acceptable."""
    import math

    ACC = 10_000
    margin = 5.0 / ACC
    # Cost-based tier dispatch (same pattern as doc_top_terms'
    # stats_fallback_bytes gate): below ~4x sf0.1 a single shuffle into
    # whole-group sorts beats the bracket plan's two scans + sketch
    # (measured crossover ~x4: kernel 0.7 s / bracket 2.1 s at x1;
    # kernel 4.2 s / bracket 2.1 s at x8) — and small inputs are exactly
    # where whole-group-per-task is safe. Catalyst's column-pruned size
    # estimate is free at plan time. r11 (guide §4.1): the small tier is
    # now the JVM sorted-aggregate form (`_usage_percentiles_sorted_agg`)
    # — same exact math, no Python boundary; the Arrow kernel stays as
    # the bracket-violation verification fallback below.
    li = t(spark, sf_dir, "lineitem")
    vals = li.select("l_returnflag", F.col("l_extendedprice").alias("v"))
    try:
        est = int(
            vals._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # estimate unavailable -> scale-safe tier
        # Log ONCE (review r8 / ADVICE): this reads a private JVM seam —
        # on Spark Connect (no _jdf) or after an upstream rename, every
        # call silently took the bracket tier, including tiny inputs
        # where the kernel is 3x faster. The fallback CHOICE is right
        # (scale-safe); the silence was the bug — an API drift would
        # invisibly change the bench-measured plan.
        global _SIZE_SEAM_WARNED
        if not _SIZE_SEAM_WARNED:
            _SIZE_SEAM_WARNED = True
            import logging

            logging.getLogger(__name__).warning(
                "usage_percentiles: optimizedPlan size estimate "
                "unavailable (Spark Connect or private-API drift); "
                "always dispatching to the scale-safe bracket tier"
            )
        est = bracket_min_bytes
    if est < bracket_min_bytes:
        return _usage_percentiles_sorted_agg(spark, sf_dir)

    probes = []
    for p in PCTS:
        probes.append(max(0.0, p - margin))
        probes.append(min(1.0, p + margin))
    probe_sql = ", ".join(repr(q) for q in probes)
    sketch_rows = (
        vals.groupBy("l_returnflag")
        .agg(
            F.count("v").alias("n"),
            F.expr(
                f"approx_percentile(v, array({probe_sql}), {ACC})"
            ).alias("br"),
        )
        .collect()
    )

    flag_type = li.schema["l_returnflag"].dataType
    out_schema = T.StructType(
        [T.StructField("l_returnflag", flag_type)]
        + [T.StructField(f"p{_tag(p)}", T.DoubleType()) for p in PCTS]
    )
    if not sketch_rows:
        return spark.createDataFrame([], out_schema)

    groups = {r["l_returnflag"]: (r["n"], r["br"]) for r in sketch_rows}

    # Brackets reach the second scan as LITERAL per-group CASE chains,
    # not a broadcast join: the join measured +1.7 s at x32 (HashedRelation
    # probe + wide row copy on every input row) while the CASE chain is
    # O(groups) comparisons inside the same codegen'd agg — measured
    # 2.4 s -> 1.28 s. Chains degrade past ~dozens of groups, so a wide
    # group domain falls back to the broadcast-join form.
    use_join = len(groups) > 64  # ONE predicate for both sites below
    if use_join:
        joined, flag_col = _bracketed_join(spark, vals, flag_type, groups)
    else:
        joined, flag_col = vals, F.col("l_returnflag")

        def _case_lit(i: int, which: int) -> Column:
            expr = F.lit(None).cast("double")
            for flag, (n, br) in groups.items():
                if n == 0 or br is None:
                    continue
                expr = F.when(
                    F.col("l_returnflag").eqNullSafe(F.lit(flag)),
                    float(br[2 * i + which]),
                ).otherwise(expr)
            return expr

    aggs = [F.count("v").alias("_cnt")]
    for i, p in enumerate(PCTS):
        tag = _tag(p)
        if use_join:
            lo, hi = F.col(f"lo{tag}"), F.col(f"hi{tag}")
        else:
            lo, hi = _case_lit(i, 0), _case_lit(i, 1)
        v = F.col("v")
        aggs += [
            # NULL v / NULL brackets make the predicate NULL -> the
            # otherwise(0) keeps the counter sums defined on every row
            F.sum(F.when(v < lo, 1).otherwise(0)).alias(f"below{tag}"),
            F.sum(F.when(v == lo, 1).otherwise(0)).alias(f"eqlo{tag}"),
            F.sum(F.when(v == hi, 1).otherwise(0)).alias(f"eqhi{tag}"),
            F.sort_array(
                F.collect_list(F.when((v > lo) & (v < hi), v))
            ).alias(f"strict{tag}"),
        ]

    # r12 (guide §5): select the ≤ 2 order statistics each percentile
    # needs INSIDE the JVM — the projection input is groups-sized, the
    # window arrays are dropped before collect, and the driver receives
    # O(groups × pcts) scalars. The target rank is recomputed from the
    # aggregate's own count with the SAME IEEE expression the driver
    # (and the small tier) use — FLOOR/CEIL(CAST(n-1 AS DOUBLE) * p) is
    # bit-identical to math.floor/ceil((n-1)*p) for any n, so no
    # per-group rank literals are needed (a first draft injected them as
    # eqNullSafe CASE chains: +0.35 s of pure py4j construction per call,
    # the exact overhead class B9/r11 removed — this form is ONE
    # selectExpr over column refs). element_at is guarded by the bounds
    # check (lazy CASE branch), so an out-of-bracket rank yields NULL —
    # the same "sketch guarantee violated" signal the driver already
    # maps to the kernel fallback.
    proj = ["l_returnflag"]
    for i, p in enumerate(PCTS):
        tag = _tag(p)
        rn = f"(CAST((_cnt - 1) AS DOUBLE) * {float(p)!r}D)"
        nstrict = f"CAST(size(strict{tag}) AS BIGINT)"
        base = f"(below{tag} + eqlo{tag})"
        for which, rk in (("f", f"FLOOR({rn})"), ("c", f"CEIL({rn})")):
            idx = f"({rk} - {base})"
            proj.append(
                f"CASE WHEN {idx} >= 0 AND {idx} < {nstrict} "
                f"THEN element_at(strict{tag}, CAST({idx} + 1 AS INT)) "
                f"END AS el{which}{tag}"
            )
        proj += [
            f"below{tag}",
            f"eqlo{tag}",
            f"eqhi{tag}",
            f"{nstrict} AS nstrict{tag}",
        ]
    window_rows = (
        joined.groupBy(flag_col).agg(*aggs).selectExpr(*proj).collect()
    )

    def order_stat(rec, tag: int, rank: int, lo, hi, el):
        below = rec[f"below{tag}"]
        eq_lo = rec[f"eqlo{tag}"]
        n_strict = rec[f"nstrict{tag}"]
        # lo == hi degenerate bracket: eq_hi re-counts the same values
        eq_hi = 0 if lo == hi else rec[f"eqhi{tag}"]
        r = rank - below
        if r < 0:
            return None  # sketch guarantee violated
        if r < eq_lo:
            return lo
        r -= eq_lo
        if r < n_strict:
            # the JVM-selected element for THIS rank; None only if the
            # selection seam drifted -> same fallback as a violation
            return el
        r -= n_strict
        if r < eq_hi:
            return hi
        return None

    result = []
    for rec in window_rows:
        flag = rec["l_returnflag"]
        n, br = groups[flag]
        out = [flag]
        for i, p in enumerate(PCTS):
            if n == 0 or br is None:
                out.append(None)
                continue
            tag = _tag(p)
            lo, hi = float(br[2 * i]), float(br[2 * i + 1])
            rn = (n - 1) * p
            frn, crn = math.floor(rn), math.ceil(rn)
            v_lo = order_stat(rec, tag, frn, lo, hi, rec[f"elf{tag}"])
            v_hi = (
                v_lo
                if frn == crn
                else order_stat(rec, tag, crn, lo, hi, rec[f"elc{tag}"])
            )
            if v_lo is None or v_hi is None:
                return _usage_percentiles_kernel(spark, sf_dir)
            out.append(_interp(v_lo, v_hi, rn, frn, crn))
        result.append(tuple(out))

    # unordered by contract (see _usage_percentiles_sorted_agg): the
    # result is a driver-local groups-sized relation either way
    return spark.createDataFrame(result, out_schema)


def _bracketed_join(spark, vals, flag_type, groups):
    """Broadcast-join form of the bracket delivery for wide group domains
    (>64 groups), where a literal CASE chain would cost O(groups) per row.
    Returns (joined_frame, flag_column) with bracket columns lo{tag}/hi{tag}."""
    bracket_fields = [T.StructField("_bf", flag_type)]
    for p in PCTS:
        tag = _tag(p)
        bracket_fields += [
            T.StructField(f"lo{tag}", T.DoubleType()),
            T.StructField(f"hi{tag}", T.DoubleType()),
        ]
    bracket_rows = []
    for flag, (n, br) in groups.items():
        row = [flag]
        for i in range(len(PCTS)):
            if n == 0 or br is None:
                row += [None, None]
            else:
                row += [float(br[2 * i]), float(br[2 * i + 1])]
        bracket_rows.append(tuple(row))
    brackets = F.broadcast(
        spark.createDataFrame(bracket_rows, T.StructType(bracket_fields))
    )
    joined = vals.join(
        brackets, vals["l_returnflag"].eqNullSafe(brackets["_bf"]), "left"
    ).select(
        vals["l_returnflag"],
        "v",
        *[f.name for f in bracket_fields[1:]],
    )
    return joined, F.col("l_returnflag")


def _usage_percentiles_sorted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r11 small-input tier: ONE JVM aggregation —
    ``sort_array(collect_list(v))`` per group — then the shared
    quantile_cont interpolation as a codegen'd projection over the sorted
    array. Replaces the Arrow kernel in the small-input dispatch (guide
    §4.1: built-ins over Python where they exist): the kernel shipped the
    whole measure column JVM->Arrow->pandas and back (measured 0.93 s at
    sf0.1); this form never leaves the JVM (measured 0.42 s, same plan
    data volume — collect_list partials carry the same doubles the
    kernel's shuffle did).

    Exactness: element selection from a sorted multiset is order-stable
    (np.sort and sort_array produce the same sorted values; NaN ranks
    last in BOTH — numpy sorts NaN to the end, Spark's double ordering
    places NaN above +Inf), and the interpolation is the SAME expression
    tree as ``_interp`` evaluated in IEEE doubles: rn = cast(n-1 as
    double)*p, v_lo*(crn-rn) + v_hi*(rn-frn), equal-ranks short-circuit
    to the element itself. collect_list drops NULLs exactly like the
    kernel's dropna; an all-NULL group keeps its row with NULL
    percentiles (empty array => n = 0 branch).

    Memory contract: identical to the kernel tier — one group's values
    materialize in one aggregation buffer, which is why BOTH only ever
    run under the small-input gate; the bracket tier owns scale."""
    li = t(spark, sf_dir, "lineitem")
    vals = li.select("l_returnflag", F.col("l_extendedprice").alias("v"))
    agg = vals.groupBy("l_returnflag").agg(
        F.sort_array(F.collect_list("v")).alias("_vs")
    )
    # The interpolation projection is built as ONE selectExpr call: the
    # previous Column-by-Column loop cost ~1.2k py4j round-trips (~0.2 s
    # of EVERY invocation — construction is inside the bench's timed
    # region, and the driver pays it at any scale). Each SQL string
    # parses to the identical expression tree the loop built — same
    # casts (size->BIGINT, rank->DOUBLE, index->INT), FLOOR/CEIL on
    # doubles returning BIGINT, and double literals via the D suffix —
    # so every IEEE double is bit-identical to the previous form.
    n_sql = "CAST(size(_vs) AS BIGINT)"
    exprs = ["l_returnflag"]
    for p in PCTS:
        rn = f"(CAST(({n_sql} - 1) AS DOUBLE) * {float(p)!r}D)"
        frn = f"FLOOR({rn})"
        crn = f"CEIL({rn})"
        v_lo = f"element_at(_vs, CAST(({frn} + 1) AS INT))"
        v_hi = f"element_at(_vs, CAST(({crn} + 1) AS INT))"
        interp = (
            f"CASE WHEN {frn} = {crn} THEN {v_lo} "
            f"ELSE {v_lo} * (CAST({crn} AS DOUBLE) - {rn}) "
            f"+ {v_hi} * ({rn} - CAST({frn} AS DOUBLE)) END"
        )
        exprs.append(
            f"CASE WHEN {n_sql} = 0 THEN CAST(NULL AS DOUBLE) "
            f"ELSE {interp} END AS p{_tag(p)}"
        )
    # No presentation orderBy (r11, guide §2.4): the final sort on a
    # groups-sized result planned a rangepartitioning Exchange plus its
    # sampling JOB on every run (2 jobs -> 1). Relations are unordered —
    # the driver's oracle hash and every consumer compare order-
    # insensitively (the r5 doc_repetition_stats precedent).
    return agg.selectExpr(*exprs)


def _usage_percentiles_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r6 exact tier: one shuffle of (flag, value) clustered by group,
    one numpy sort per group in an Arrow kernel. Kept as the verification
    fallback for usage_percentiles (unconditionally exact, but the
    parallelism unit is the GROUP and the whole measure column crosses
    into Python — 16.5 s vs the bracket plan's ~1 s at x32)."""
    import numpy as np
    import pandas as pd

    li = t(spark, sf_dir, "lineitem")
    # group-column type comes from the SOURCE, like the bracket tier's
    # out_schema (review r7: a hardcoded string type made the size
    # dispatch change the output schema on non-string fixtures)
    schema = T.StructType(
        [T.StructField("l_returnflag", li.schema["l_returnflag"].dataType)]
        + [T.StructField(f"p{_tag(p)}", T.DoubleType()) for p in PCTS]
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
                out[f"p{_tag(p)}"] = [None]  # quantile of no values
                continue
            rn = (n - 1) * p
            frn, crn = math.floor(rn), math.ceil(rn)
            # the shared quantile_cont expression (bit-parity with the
            # bracket tier by construction)
            out[f"p{_tag(p)}"] = [
                _interp(v[frn], v[crn], rn, frn, crn)
            ]
        return pd.DataFrame(out)

    return (
        li.select("l_returnflag", F.col("l_extendedprice").alias("v"))
        .groupBy("l_returnflag")
        .applyInPandas(kernel, schema)
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
                ).alias(f"p{_tag(p)}")
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
