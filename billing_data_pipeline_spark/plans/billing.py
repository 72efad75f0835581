"""Billing-shaped query catalog (SURVEY.md §2.2, §2.4, §2.6, §2.3 J1).

Each query re-expresses one reference operator on the driver's testdata
(mapping per FIXTURES.md §4: lineitem revenue <-> credit_usage, events
<-> user activity, TPC-H dims <-> billing dims). Reference citations sit on
each query; oracles are ANSI SQL for DuckDB over the same parquet views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import (
    exact_sum,
    frequency_count,
    global_sum,
    grouped_profile,
    success_rate,
    top_k,
)
from ..operators.ingest import dedup_append
from ..registry import register
from ._util import REVENUE_SQL, davg_sql, dsum_sql, revenue, t


@register(
    "daily_aggregates",
    tags=("aggregate", "reference:A1"),
    bench=True,
    oracle=f"""
SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
       CAST(month(l_shipdate) AS INTEGER) AS month,
       CAST(day(l_shipdate) AS INTEGER) AS day,
       COUNT(*) AS transaction_count,
       {dsum_sql(REVENUE_SQL)} AS total_usage,
       {davg_sql(REVENUE_SQL)} AS avg_usage,
       COUNT(DISTINCT l_suppkey) AS unique_suppliers,
       COUNT(DISTINCT l_partkey) AS unique_parts,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_count,
       CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS kept_count
FROM lineitem
GROUP BY 1, 2, 3
""",
)
def daily_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily aggregate table (reference: pipeline/assets/aggregates.py:34-48):
    GROUP BY year/month/day with count, sum, avg, 2x exact COUNT(DISTINCT),
    2x conditional SUM(CASE WHEN ...)."""
    li = t(spark, sf_dir, "lineitem")
    # r12 (guide §2.3): group by the raw DATE and split it into
    # year/month/day AFTER the aggregate. A DATE is a bijection of its
    # (y, m, d) triple, so the groups — and hence every aggregate value —
    # are identical; what moves is WHERE the calendar extraction runs:
    # once per GROUP (~2.5k rows) instead of three times per input row
    # on the serial scan task, and the exchange carries one 4-byte date
    # key instead of three ints.
    return grouped_profile(
        li,
        ["l_shipdate"],
        revenue(),
        distinct_cols={"unique_suppliers": "l_suppkey", "unique_parts": "l_partkey"},
        conditions={
            "returned_count": F.col("l_returnflag") == "R",
            "kept_count": F.col("l_returnflag") != "R",
        },
    ).select(
        F.year("l_shipdate").alias("year"),
        F.month("l_shipdate").alias("month"),
        F.dayofmonth("l_shipdate").alias("day"),
        "transaction_count",
        "total_usage",
        "avg_usage",
        "unique_suppliers",
        "unique_parts",
        "returned_count",
        "kept_count",
    )


@register("daily_aggregates_hll", tags=("aggregate", "approx", "reference:A1-ext"))
def daily_aggregates_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A1 shape with approx_count_distinct (HLL) instead of exact
    distincts — the mergeable variant for incremental 100 TB rollups
    (SURVEY.md §4 OPT5 note). Approximate by construction => rows-only."""
    li = t(spark, sf_dir, "lineitem")
    # same date-key regroup as daily_aggregates (r12): identical groups,
    # calendar split runs per group after the aggregate
    return grouped_profile(
        li,
        ["l_shipdate"],
        revenue(),
        distinct_cols={"unique_suppliers": "l_suppkey", "unique_parts": "l_partkey"},
        approx=True,
    ).select(
        F.year("l_shipdate").alias("year"),
        F.month("l_shipdate").alias("month"),
        F.dayofmonth("l_shipdate").alias("day"),
        "transaction_count",
        "total_usage",
        "avg_usage",
        "unique_suppliers",
        "unique_parts",
    )


@register(
    "user_aggregates",
    tags=("aggregate", "reference:A2"),
    bench=True,
    oracle=f"""
SELECT user_id,
       COUNT(*) AS transaction_count,
       {dsum_sql('value')} AS total_usage,
       {davg_sql('value')} AS avg_usage,
       COUNT(DISTINCT event_type) AS event_types_used,
       MIN(CAST(ts AS TIMESTAMP)) AS first_activity,
       MAX(CAST(ts AS TIMESTAMP)) AS last_activity
FROM events
GROUP BY user_id
""",
)
def user_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User activity profile (reference: aggregates.py:99-115): per-user
    count/sum/avg, COUNT(DISTINCT), MIN/MAX timestamp activity timeline."""
    ev = t(spark, sf_dir, "events")
    return grouped_profile(
        ev,
        ["user_id"],
        "value",
        distinct_cols={"event_types_used": "event_type"},
        time_col="ts",
    )


@register(
    "service_aggregates",
    tags=("aggregate", "reference:A3"),
    bench=True,
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS transaction_count,
       {dsum_sql(REVENUE_SQL)} AS total_usage,
       {davg_sql(REVENUE_SQL)} AS avg_usage,
       COUNT(DISTINCT l_suppkey) AS unique_suppliers,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS discounted_count,
       CAST(SUM(CASE WHEN l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS full_price_count
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def service_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service-dimension aggregate (reference: aggregates.py:166-181):
    3-column composite grouping -> here (l_returnflag, l_linestatus), with
    conditional success/failure counts -> discounted/full-price."""
    li = t(spark, sf_dir, "lineitem")
    return grouped_profile(
        li,
        ["l_returnflag", "l_linestatus"],
        revenue(),
        distinct_cols={"unique_suppliers": "l_suppkey"},
        conditions={
            "discounted_count": F.col("l_discount") > 0.05,
            "full_price_count": F.col("l_discount") <= 0.05,
        },
        # 6 groups pin the reduce side to 6 tasks; widening the (single
        # task) scan is the only way to parallelize the suppkey dedup.
        # Measured r11 with the sort-free exchange: 0.73 -> 0.54 s.
        widen_scan=True,
    )


@register(
    "region_aggregates",
    tags=("aggregate", "join", "reference:A4"),
    bench=True,
    oracle=f"""
SELECT r.r_name AS region,
       COUNT(*) AS transaction_count,
       {dsum_sql('c.c_acctbal')} AS total_usage,
       {davg_sql('c.c_acctbal')} AS avg_usage,
       COUNT(DISTINCT n.n_name) AS nations_used,
       COUNT(DISTINCT c.c_mktsegment) AS segments_used
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def region_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region aggregate (reference: aggregates.py:229-242) with the region
    dimension resolved via broadcast joins (dims are tiny at any scale)."""
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return grouped_profile(
        joined.withColumnRenamed("r_name", "region"),
        ["region"],
        "c_acctbal",
        distinct_cols={"nations_used": "n_name", "segments_used": "c_mktsegment"},
    )


@register(
    "global_usage",
    tags=("aggregate", "reference:A5"),
    oracle=f"""
SELECT COALESCE({dsum_sql(REVENUE_SQL)}, 0.0) AS total_usage
FROM lineitem
""",
)
def global_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped total (reference: reports.py:21-26) with the Python-side
    NULL->0.0 default folded into the plan as COALESCE."""
    return global_sum(t(spark, sf_dir, "lineitem"), revenue(), "total_usage")


@register(
    "operation_frequency",
    tags=("aggregate", "sort", "reference:A6"),
    oracle="""
SELECT event_type, COUNT(*) AS count
FROM events
GROUP BY event_type
ORDER BY count DESC, event_type ASC
""",
)
def operation_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency distribution (reference: reports.py:48-53), deterministic
    tiebreak added for oracle parity."""
    return frequency_count(t(spark, sf_dir, "events"), "event_type")


@register(
    "tier_success_rate",
    tags=("aggregate", "derived", "reference:A7"),
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS success_count,
       COUNT(*) AS total_count,
       (CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) AS success_rate
FROM orders
GROUP BY o_orderpriority
""",
)
def tier_success_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-rate aggregate (reference: reports.py:57-66): the
    CAST(SUM(CASE..) AS FLOAT)/COUNT(*) success-rate pattern, on orders
    (fulfilled := o_orderstatus = 'F')."""
    return success_rate(
        t(spark, sf_dir, "orders"),
        "o_orderpriority",
        F.col("o_orderstatus") == "F",
    )


@register(
    "ledger_rollup",
    tags=("aggregate", "reference:A8"),
    oracle="""
SELECT COUNT(*) AS files_processed,
       CAST(SUM(n_chars) AS BIGINT) AS total_records
FROM documents
""",
)
def ledger_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledger rollup (reference: reports.py:123-126): COUNT(*) +
    SUM(record_count) over the processed-files ledger, stood in by
    documents(n_chars)."""
    return t(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("files_processed"),
        F.sum("n_chars").alias("total_records"),
    )


@register(
    "row_counts",
    tags=("aggregate", "setop", "reference:A9"),
    oracle="""
SELECT 'customer' AS table_name, COUNT(*) AS n FROM customer
UNION ALL SELECT 'events', COUNT(*) FROM events
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
UNION ALL SELECT 'orders', COUNT(*) FROM orders
""",
)
def row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar COUNT(*) probes (reference: 7 call sites, e.g.
    ingest.py:243-245) expressed as one UNION ALL metadata query
    (set-op surface, SURVEY.md §2.7)."""
    parts = [
        t(spark, sf_dir, name)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(name).alias("table_name"), "n")
        for name in ("customer", "events", "lineitem", "orders")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "top_users",
    tags=("topk", "reference:T1"),
    oracle="""
SELECT user_id, COUNT(*) AS transaction_count
FROM events
GROUP BY user_id
ORDER BY transaction_count DESC, user_id ASC
LIMIT 5
""",
)
def top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most active users (reference: reports.py:30-35). Plans as
    TakeOrderedAndProject (heap top-k, no global sort)."""
    counts = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("transaction_count"))
    )
    return top_k(counts, "transaction_count", 5, tiebreak=["user_id"])


@register(
    "top_regions_by_usage",
    tags=("topk", "join", "reference:T2"),
    oracle=f"""
SELECT n.n_name AS nation,
       {dsum_sql(REVENUE_SQL)} AS total_usage
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY total_usage DESC, nation ASC
LIMIT 5
""",
)
def top_regions_by_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most expensive regions (reference: reports.py:39-44). Supplier
    is SF-proportional, so it carries no broadcast hint — AQE picks
    broadcast at bench scale on its own and a shuffle join at 100 TB
    (r8 unhint pass: a forced broadcast of an unbounded dim is the OOM
    class). Nation is bounded (25 rows at any SF) and stays hinted."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    joined = li.join(s, li.l_suppkey == s.s_suppkey).join(
        n, s.s_nationkey == n.n_nationkey
    )
    agg = joined.groupBy(F.col("n_name").alias("nation")).agg(
        exact_sum(revenue()).cast("double").alias("total_usage")
    )
    return top_k(agg, "total_usage", 5, tiebreak=["nation"])


@register(
    "dedup_anti_join",
    tags=("join", "dedup", "reference:J1"),
    bench=True,
    oracle="""
SELECT i.l_orderkey, i.l_partkey, i.l_suppkey, i.l_linenumber
FROM lineitem i
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem e
    WHERE e.l_orderkey % 10 = 0
      AND e.l_orderkey = i.l_orderkey
      AND e.l_partkey = i.l_partkey
      AND e.l_suppkey = i.l_suppkey
      AND e.l_linenumber = i.l_linenumber
)
""",
)
def dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's idempotent-insert anti-join (reference:
    pipeline/assets/ingest.py:248-257): incoming batch LEFT ANTI JOIN
    existing table on the natural key. Here lineitem plays the batch and a
    10% key sample plays the existing table; the existing side is pruned to
    key columns before the join (OPT3)."""
    li = t(spark, sf_dir, "lineitem")
    keys = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    existing = li.filter(F.col("l_orderkey") % 10 == 0)
    # lineitem's natural key is unique, so skip the intra-batch dedup
    # shuffle — the anti-join probes a broadcast of existing keys with no
    # batch-side exchange (matches the oracle's NOT EXISTS exactly).
    return dedup_append(li.select(*keys), existing, keys, dedup_batch=False)


@register(
    "backfill_window",
    tags=("filter", "reference:ST6"),
    oracle=f"""
SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
       CAST(month(l_shipdate) AS INTEGER) AS month,
       COUNT(*) AS transaction_count,
       {dsum_sql(REVENUE_SQL)} AS total_usage
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2
""",
)
def backfill_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill date-window filtering (reference: ingest.py:13-74 +
    configs/backfill.yaml): from/to bounds compile to pushed-down predicates
    (partition pruning on a date-partitioned lake)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy(
            F.year("l_shipdate").alias("year"), F.month("l_shipdate").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("transaction_count"),
            exact_sum(revenue()).cast("double").alias("total_usage"),
        )
    )


@register(
    "case_cast_projection",
    tags=("projection", "reference:P5,P6"),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final,
       CAST(o_totalprice AS FLOAT) AS price_f,
       o_orderpriority AS priority
FROM orders
WHERE o_custkey % 100 = 0
""",
)
def case_cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection surface (reference: P1-P6): named-column select, equality
    predicate, CASE WHEN conditional, CAST to FLOAT (reports.py:62)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_custkey") % 100 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
        F.col("o_totalprice").cast("float").alias("price_f"),
        F.col("o_orderpriority").alias("priority"),
    )


@register(
    "point_lookup",
    tags=("filter", "reference:P3"),
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_id = 4242
""",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized equality point lookup (reference: ingest.py:223-226,
    WHERE filename = ?). The predicate pushes to the parquet scan."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") == 4242)
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "lineitem_quality_checks",
    tags=("quality", "constraints", "reference:1.3"),
    oracle="""
SELECT COUNT(*) AS n_rows,
       -- dup count over FULLY-KEYED rows on both engines: Spark's
       -- multi-arg count_distinct drops NULL-component rows while
       -- DuckDB's row-struct DISTINCT would count them (review r3)
       COUNT(CASE WHEN l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
                  THEN 1 END)
         - COUNT(DISTINCT (l_orderkey, l_linenumber))
             FILTER (WHERE l_orderkey IS NOT NULL
                       AND l_linenumber IS NOT NULL) AS dup_natural_keys,
       COUNT(*) - COUNT(l_shipdate) AS null_shipdates,
       CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS negative_prices,
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS bad_discounts,
       CAST(SUM(CASE WHEN l_shipdate <  TIMESTAMP '1992-01-01'
                       OR l_shipdate >= TIMESTAMP '1999-01-01'
                     THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range_dates
FROM lineitem
""",
)
def lineitem_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint report in ONE aggregate pass — the engine's
    answer to the reference's declarative UNIQUE/type constraints
    (SURVEY.md §1.3: Spark can't enforce, so constraints become checked
    properties): natural-key duplicate count, null counts, domain-range
    violations. Map-side partials collapse 100 TB to one row per task;
    the key-distinct rides the same Expand pass as the profile aggs."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.count(
                F.when(
                    F.col("l_orderkey").isNotNull()
                    & F.col("l_linenumber").isNotNull(),
                    1,
                )
            )
            - F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("dup_natural_keys"),
        (F.count(F.lit(1)) - F.count("l_shipdate")).alias("null_shipdates"),
        F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0)).alias(
            "negative_prices"
        ),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            .otherwise(0)
        ).alias("bad_discounts"),
        F.sum(
            F.when(
                (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
                | (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("out_of_range_dates"),
    )
