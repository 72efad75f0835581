"""[EXT] Relational surface beyond the reference: multi-table joins, outer
joins, window functions, sessionization, set ops, JSON, date bucketing,
pivot and rollup (SURVEY.md §2.5, §2.7, §2.8 EXT notes).

The reference's only join is the dedup anti-join (J1); everything here is
the standard analytical surface a billing engine needs the moment reports
outgrow single-table scans — expressed so Catalyst gets broadcastable dims,
partial aggregation, and TakeOrderedAndProject top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import MEASURE_DECIMAL, exact_sum
from ..operators import cdc as _cdc
from ..operators.windows import running_total, sessionize, with_sequence
from ..registry import register
from ._util import REVENUE_SQL, dsum_sql, fdiv_sql, floor_bucket_us, revenue, t


@register(
    "shipping_priority",
    tags=("join", "topk", "tpch:q3-shape"),
    bench=True,
    oracle=f"""
SELECT l.l_orderkey,
       {dsum_sql(REVENUE_SQL)} AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-03-15'
  AND l.l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter -> fact join -> grouped revenue
    -> top-10. The mktsegment filter keeps a CONSTANT FRACTION (~20%) of
    customer, so the filtered side is still SF-proportional — no broadcast
    hint (r8 unhint: the earlier docstring's "small at any SF" was wrong);
    AQE broadcasts it at bench scale and shuffle-joins at 100 TB. The
    lineitem filter pushes to the parquet scan."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-03-15")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        c, o.o_custkey == c.c_custkey
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(exact_sum(revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "local_supplier_volume",
    tags=("join", "tpch:q5-shape"),
    bench=True,
    oracle=f"""
SELECT n.n_name AS nation,
       {dsum_sql(REVENUE_SQL)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join: two big facts (orders, lineitem) meet on
    the shuffle; supplier/nation/region resolve broadcast. CUSTOMER joins
    unhinted (review r5: it carries no filter here, and customer is the
    LARGEST dimension — low-TBs at 100 TB, unboundable as a forced
    broadcast build; AQE still picks broadcast at bench scale on its own).
    The c_nationkey = s_nationkey correlation runs as a post-join filter."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        # supplier unhinted (review r7): SF-proportional dim — a forced
        # broadcast is the 100 TB OOM class the r5 customer-unhint
        # removed; AQE still picks broadcast at bench scale
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        exact_sum(revenue()).cast("double").alias("revenue")
    )


@register(
    "orders_without_items",
    tags=("join", "outer", "reference:P4"),
    oracle="""
SELECT o.o_orderkey
FROM orders o
LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
  ON o.o_orderkey = l.l_orderkey
WHERE l.l_orderkey IS NULL
""",
)
def orders_without_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER JOIN + IS NULL — the reference's literal anti-join spelling
    (reference: pipeline/assets/ingest.py:250-256) kept as an explicit outer
    join to cover the P4 NULL-predicate surface."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .filter(F.col("l_orderkey").isNull())
        .select("o_orderkey")
    )


@register(
    "user_event_sequence",
    tags=("window",),
    oracle="""
SELECT event_id, user_id,
       CAST(ts AS TIMESTAMP) AS ts,
       row_number() OVER w AS seq,
       lag(event_type) OVER w AS prev_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
""",
)
def user_event_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event sequence: row_number + lag over
    (user_id, ts, event_id) — the window layer the reference's 'activity
    timeline' implies (SURVEY.md §2.5)."""
    ev = t(spark, sf_dir, "events")
    return with_sequence(
        ev, "user_id", "ts", "event_id", lag_cols={"prev_type": "event_type"}
    ).select("event_id", "user_id", "ts", "seq", "prev_type")


@register(
    "user_running_total",
    tags=("window",),
    oracle=f"""
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(CAST(value AS STRING) AS DECIMAL(30,6)))
            OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE)
         AS running_total
FROM events
""",
)
def user_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal running sum per user (window frame aggregation; decimal
    because engines differ in float association for running frames)."""
    ev = t(spark, sf_dir, "events")
    return running_total(ev, "user_id", "ts", "event_id", "value").select(
        "event_id", "user_id", "running_total"
    )


@register(
    "user_sessions",
    tags=("window", "session"),
    oracle="""
WITH seq AS (
    SELECT user_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           lag(epoch_us(CAST(ts AS TIMESTAMP)))
             OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
    FROM events
),
marks AS (
    SELECT user_id,
           CASE WHEN prev_us IS NULL OR ts_us - prev_us <= 1800 * 1000000
                THEN 0 ELSE 1 END AS new_session
    FROM seq
)
SELECT user_id,
       CAST(SUM(new_session) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM marks
GROUP BY user_id
""",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) -> per-user session count. The
    batch equivalent of Structured Streaming session windows; boundary
    semantics match session_window exactly (touching windows merge: a gap
    of exactly 30 min extends the session — verified against the native
    operator in test_operators.py)."""
    ev = t(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", "event_id", gap_seconds=1800)
    return s.groupBy("user_id").agg(
        F.max("session_seq").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "purchasers_without_errors",
    tags=("setop",),
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 90
""",
)
def purchasers_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference) — set-op surface (SURVEY.md §2.7;
    the reference only ever unions procedurally)."""
    ev = t(spark, sf_dir, "events")
    big = F.col("value") > 90
    purchasers = ev.filter((F.col("event_type") == "purchase") & big).select("user_id")
    erring = ev.filter((F.col("event_type") == "error") & big).select("user_id")
    return purchasers.subtract(erring)


@register(
    "multi_action_users",
    tags=("setop",),
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
INTERSECT
SELECT user_id FROM events WHERE event_type = 'signup' AND value > 90
""",
)
def multi_action_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — set-op surface."""
    ev = t(spark, sf_dir, "events")
    big = F.col("value") > 90
    a = ev.filter((F.col("event_type") == "purchase") & big).select("user_id")
    b = ev.filter((F.col("event_type") == "signup") & big).select("user_id")
    return a.intersect(b)


# ONE oracle constant for the three JSON tiers (string-path, VARIANT,
# from_json-typed) — the "provably value-identical" claim their
# docstrings make is structural only when the oracle is literally shared
# (review r7: it was three f-string copies that could silently drift).
#
# Containment (r9, --badjson sweep): TRY_CAST(props AS JSON) — DuckDB's
# json_extract_string ERRORS the whole query on malformed JSON (truncated
# object, empty string) where every Spark tier yields NULL — and TRY_CAST
# to INTEGER for the value (CAST('abc' AS INTEGER) errors likewise).
# Contract: unparseable props / missing / non-integer k => NULL k_val.
#
# PRECONDITION for tier identity (documented by-nature divergence, same
# family as ROUND()): $.k must be an int32-ranged JSON INTEGER, JSON
# null, or absent. Beyond that the four extraction APIs disagree four
# ways BY DESIGN (measured r9, matrix in PLANS.md): k=1.5 -> from_json
# NULL / variant_get 1 (truncates) / string-path NULL (try_cast '1.5')
# / DuckDB 2 (rounds via DOUBLE); k="7" -> from_json NULL (no string
# coercion) vs 7 everywhere else; k=true -> variant 1, others NULL;
# duplicate keys -> Jackson last-wins vs yyjson first-wins. The badjson
# fixture injects only precondition-respecting garbage; data beyond the
# precondition needs ONE declared tier, not cross-engine equality.
_JSON_ROLLUP_ORACLE = f"""
SELECT TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INTEGER) AS k_val,
       COUNT(*) AS n,
       {dsum_sql('value')} AS total_value
FROM events
GROUP BY 1
"""


@register(
    "json_props_rollup",
    tags=("json", "reference:F-ext"),
    oracle=_JSON_ROLLUP_ORACLE,
)
def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column (SURVEY.md §2.8
    [EXT]: events.props is a JSON string in the driver testdata)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            # try_cast (r9, --badjson sweep): ANSI CAST raises
            # CAST_INVALID_INPUT on a non-numeric k (k="abc") and killed
            # the job; NULL k_val is the contract for junk
            "k_val", F.get_json_object("props", "$.k").try_cast("int")
        )
        .groupBy("k_val")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").cast("double").alias("total_value"),
        )
    )


@register(
    "monthly_revenue",
    tags=("date", "reference:F2-F4"),
    oracle=f"""
SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month_start,
       COUNT(*) AS n,
       {dsum_sql(REVENUE_SQL)} AS revenue
FROM lineitem
GROUP BY 1
""",
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc month bucketing (scalar date surface F2-F4; DuckDB's
    date_trunc returns DATE so the oracle casts back to TIMESTAMP)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.date_trunc("month", "l_shipdate").alias("month_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(revenue()).cast("double").alias("revenue"),
        )
    )


@register(
    "returnflag_pivot",
    tags=("pivot",),
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(CAST(l_quantity AS STRING) AS DECIMAL(30,6)) END) AS STRING) AS DOUBLE) AS qty_open,
       CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(CAST(l_quantity AS STRING) AS DECIMAL(30,6)) END) AS STRING) AS DOUBLE) AS qty_finished
FROM lineitem
GROUP BY l_returnflag
""",
)
def returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (Spark-native groupBy().pivot() with explicit value list — no
    extra pass to discover values, which matters at scale)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(MEASURE_DECIMAL)).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_finished")
    )


@register(
    "status_rollup",
    tags=("rollup",),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       {dsum_sql('l_quantity')} AS total_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
HAVING COUNT(*) > 0
""",
)
def status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total; NULL-filled grouping
    columns match ANSI semantics on both engines)."""
    li = t(spark, sf_dir, "lineitem")
    # HAVING n > 0 on both engines: on EMPTY input DuckDB (per the SQL
    # standard) still emits the grand-total grouping as one zero row while
    # Spark emits none — the filter is a no-op on any non-empty input and
    # aligns the empty case to Spark (empty-tables sweep)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("l_quantity").cast("double").alias("total_qty"),
        )
        .filter(F.col("n") > 0)
    )


@register(
    "priority_status_cube",
    tags=("cube",),
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
HAVING COUNT(*) > 0
""",
)
def priority_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 2^k grouping combinations in one pass
    (Catalyst Expand), ANSI NULL-filling on both engines."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice").cast("double").alias("total_price"),
        )
        .filter(F.col("n") > 0)  # empty-input alignment, see status_rollup
    )


@register(
    "user_hourly_rolling_sum",
    tags=("window", "range-frame"),
    oracle="""
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(CAST(value AS STRING) AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            AS STRING) AS DOUBLE) AS hour_sum
FROM events
""",
)
def user_hourly_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (SURVEY.md §2.5): per user, the rolling sum of
    `value` over the trailing hour of EVENT TIME — rangeBetween on integer
    epoch-µs, exact-decimal accumulator (frame sums must be engine-order
    independent)."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        exact_sum("value").over(w).cast("double").alias("hour_sum"),
    )


@register(
    "late_shipment_priority",
    tags=("join", "semi", "subquery", "tpch:q4-shape"),
    bench=True,
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS: orders in a quarter having at least one
    lineitem shipped >60 days after order date, counted per priority.

    Join orientation matters: Spark's BroadcastHashJoin supports LeftSemi
    only with BuildRight, so the natural ``orders left_semi lineitem``
    formulation broadcasts the FACT side (measured: 600k-row build at
    sf0.1; unboundable at 100 TB). Instead the fact probes the quarter's
    orders (the smaller side) through an inner join, and each order dedups
    to one row before the per-priority count — same result, smaller build
    side at any scale (0.75 s -> 0.47 s median at sf0.1). The quarter is
    still SF-proportional, so the build side carries no broadcast hint —
    AQE decides (r8 unhint). The EXISTS date bound also implies a derived scan predicate
    ``l_shipdate > quarter_start + 60d`` that Catalyst cannot infer across
    the non-equi join condition; stated explicitly it reaches the parquet
    scan as a PushedFilter (row-group pruning on a date-sorted lake)."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .filter(F.col("l_shipdate") > F.date_add(F.lit("1996-01-01").cast("date"), 60))
    )
    # No broadcast hint on o: a quarter of orders is SF-proportional
    # (~3.5% of a fact table — unboundable at 100 TB). The inner-join +
    # dedup ORIENTATION is the scale win (vs left_semi's BuildRight fact
    # broadcast); AQE picks broadcast at bench scale on its own and a
    # safe sort-merge join at scale (r8 unhint pass).
    hits = li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        # type-preserving +60d: F.date_add would TRUNCATE a timestamp
        # o_orderdate to its date before adding, silently shifting the
        # cutoff to midnight while the oracle's INTERVAL keeps time-of-day
        # (review r3; the testdata currently ships midnight-aligned dates,
        # but the loader doesn't guarantee that across regenerations)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
    )
    # Per-priority COUNT(DISTINCT o_orderkey) instead of
    # dropDuplicates-then-count (r11, guide §2.4): the dedup planned as
    # two SortAggregates around an o_orderkey exchange (first() is not
    # hash-aggregable) plus the groupBy's own exchange — 3 sorts, 3
    # exchanges total. The single-distinct rewrite is all HashAggregates
    # with map-side partial dedup of (priority, orderkey) pairs (the
    # grouped_profile k=1 shape; measured 0.49 -> 0.41 s at sf0.1, plan:
    # SortAggregate x2 -> none). Equivalent by construction: o_orderkey
    # cannot be NULL after the equi-join, and a key is counted once per
    # priority it actually joins under — identical to dedup-then-count
    # whenever orderkey -> priority is functional (the orders-key
    # contract), and CLOSER to the per-row EXISTS oracle if it ever
    # is not.
    # No presentation orderBy (r11, guide §2.4): sorting the 5-row
    # per-priority result planned a rangepartitioning Exchange plus its
    # range-bounds sampling JOB every run (3 jobs -> 2). Relations are
    # unordered — the driver hash-compares order-insensitively (the r5
    # doc_repetition_stats precedent).
    return (
        hits.select("o_orderkey", "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_orderkey").alias("order_count"))
    )


@register(
    "small_quantity_part_revenue",
    tags=("join", "subquery", "correlated", "tpch:q17-shape"),
    oracle=f"""
WITH part_avg AS (
    SELECT l_partkey,
           0.2 * ({dsum_sql('l_quantity')} / COUNT(l_quantity)) AS qty_cut
    FROM lineitem GROUP BY l_partkey
)
SELECT {dsum_sql('l.l_extendedprice')} AS total_small_qty_revenue,
       CAST(COUNT(*) AS BIGINT) AS line_count
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND l.l_quantity < a.qty_cut
""",
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated scalar subquery, decorrelated by hand the
    way Catalyst would: the per-part average becomes a grouped subplan
    joined back on partkey (one shuffle each side, co-partitioned); the
    brand-filtered part side is a constant fraction of an SF-proportional
    dim so it carries no broadcast hint (AQE decides; r8 unhint). The
    0.2*avg cut uses the exact decimal-sum/count average so the boundary
    predicate is bit-identical to the oracle's."""
    li = t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                exact_sum("l_quantity").cast("double")
                / F.count("l_quantity")
            )
        ).alias("qty_cut")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
    )
    return joined.agg(
        exact_sum("l_extendedprice").cast("double").alias("total_small_qty_revenue"),
        F.count("*").alias("line_count"),
    )


@register(
    "top_supplier_revenue",
    tags=("subquery", "scalar", "tpch:q15-shape"),
    oracle=f"""
WITH rev AS (
    SELECT l_suppkey, {dsum_sql(REVENUE_SQL)} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s.s_suppkey
""",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped scalar subquery: supplier(s) hitting the global max
    quarterly revenue. The max is a one-row aggregate cross-joined
    (broadcast) back onto the grouped revenue — no single-partition window
    bottleneck; exact decimal sums make the equality safe across engines."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        exact_sum(revenue()).cast("double").alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = t(spark, sf_dir, "supplier")
    at_max = rev.join(
        F.broadcast(max_rev), rev.total_revenue == max_rev.max_revenue
    )
    # Broadcast the at-most-tie-count at_max side, not ALL of supplier
    # (review r5: the old hint built a hash table over the unbounded dim
    # to probe it with ~1 row — backwards at any scale)
    return (
        s.join(F.broadcast(at_max), at_max.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "large_order_customers",
    tags=("join", "subquery", "having", "tpch:q18-shape"),
    oracle=f"""
WITH big AS (
    SELECT l_orderkey, {dsum_sql("l_quantity")} AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING {dsum_sql("l_quantity")} > 280
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 50
""",
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped HAVING subquery: orders whose summed quantity tops
    280, joined back to customer. The HAVING filter runs on the grouped
    side BEFORE the joins, so only qualifying orderkeys (a tiny constant
    fraction, but still SF-proportional — so unhinted, AQE broadcasts it
    at bench scale; r8 unhint) flow into them; top-k via
    TakeOrderedAndProject."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity").cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 280)
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        big
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


@register(
    "important_parts_share",
    tags=("subquery", "scalar", "tpch:q11-shape"),
    oracle=f"""
WITH r AS (
    SELECT l_partkey, {dsum_sql(REVENUE_SQL)} AS part_revenue
    FROM lineitem GROUP BY l_partkey
),
total AS (SELECT CAST(CAST(SUM(CAST(CAST(part_revenue AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS tv FROM r)
SELECT r.l_partkey, r.part_revenue
FROM r, total
WHERE r.part_revenue > 0.0005 * total.tv
ORDER BY r.part_revenue DESC, r.l_partkey ASC
""",
)
def important_parts_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped global-fraction filter: parts whose revenue exceeds
    0.0005 of total revenue. The total re-aggregates the grouped result
    (not the raw fact — one scan feeds both levels) and joins back as a
    one-row broadcast; exact decimal sums keep the boundary predicate
    bit-identical."""
    li = t(spark, sf_dir, "lineitem")
    r = li.groupBy("l_partkey").agg(
        exact_sum(revenue()).cast("double").alias("part_revenue")
    )
    total = r.agg(
        exact_sum(F.col("part_revenue")).cast("double").alias("tv")
    )
    return (
        r.crossJoin(F.broadcast(total))
        .filter(F.col("part_revenue") > 0.0005 * F.col("tv"))
        .select("l_partkey", "part_revenue")
        .orderBy(F.col("part_revenue").desc(), F.col("l_partkey").asc())
    )


@register(
    "conversion_funnel",
    tags=("ext", "events", "funnel"),
    oracle="""
WITH per_user AS (
    -- CAST(ts AS TIMESTAMP) floors nanos to micros like Spark's loader,
    -- so the strict < stage comparisons agree at micro precision
    -- (review r5 — same class as latest_event_per_user)
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS t_signup,
           MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
           MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
    FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS users_total,
       CAST(COUNT(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS BIGINT) AS did_signup,
       CAST(COUNT(CASE WHEN t_signup < t_view THEN 1 END) AS BIGINT) AS signup_then_view,
       CAST(COUNT(CASE WHEN t_signup < t_view AND t_view < t_purchase THEN 1 END) AS BIGINT)
           AS full_funnel
FROM per_user
""",
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loose conversion funnel (signup -> first view -> first purchase in
    chronological order) from ONE groupBy pass: per-user conditional MINs
    pivot the steps into columns, then ordering predicates count each
    stage — no joins, no windows, one user-keyed shuffle that AQE-coalesces.
    NULL semantics do the funnel math: a missing step yields NULL and every
    comparison against it is false on both engines."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return per_user.agg(
        F.count("*").alias("users_total"),
        F.count(F.when(F.col("t_signup").isNotNull(), 1)).alias("did_signup"),
        F.count(F.when(F.col("t_signup") < F.col("t_view"), 1)).alias(
            "signup_then_view"
        ),
        F.count(
            F.when(
                (F.col("t_signup") < F.col("t_view"))
                & (F.col("t_view") < F.col("t_purchase")),
                1,
            )
        ).alias("full_funnel"),
    )


@register(
    "latest_event_per_user",
    tags=("window", "dedup", "qualify"),
    bench=True,
    oracle="""
WITH ranked AS (
    -- CAST(ts AS TIMESTAMP): when events ships as TIMESTAMP(NANOS), raw
    -- ts ranks at nano precision while Spark's loader floors to micros —
    -- micro-equal nano-distinct ties would pick different rows (review
    -- r5; every sibling events oracle already casts)
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                       event_id DESC) AS rn
    FROM events
)
SELECT user_id, ts, event_type, value FROM ranked WHERE rn = 1
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Current state' dedup: the most recent event per user via
    row_number()=1 (QUALIFY pattern; event_id tiebreak makes concurrent
    timestamps deterministic). One shuffle on the natural key; Spark plans
    a partial window-group-limit before the exchange, so each map task
    ships at most one row per user it saw — the shuffle carries ~|users|
    rows, not |events|."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_type", "value")
    )


@register(
    "order_metrics_unpivot",
    tags=("unpivot", "melt"),
    oracle="""
WITH m AS (
    SELECT o_orderstatus,
           CAST(COUNT(*) AS DOUBLE) AS order_count,
           CAST(CAST(SUM(CAST(CAST(o_totalprice AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'order_count' AS metric, order_count AS value FROM m
UNION ALL
SELECT o_orderstatus, 'total_price' AS metric, total_price AS value FROM m
""",
)
def order_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt of per-status metrics via the native unpivot
    operator (reporting/export shape). Unpivot is a zero-shuffle generator
    over the (tiny) aggregated table; the oracle spells it dialect-neutral
    as UNION ALL."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("order_count"),
        exact_sum("o_totalprice")
        .cast("double")
        .alias("total_price"),
    )
    return m.unpivot(
        ["o_orderstatus"], ["order_count", "total_price"], "metric", "value"
    )


@register(
    "promo_revenue_share",
    tags=("join", "conditional-agg", "tpch:q14-shape"),
    oracle=f"""
SELECT 100.0 * {dsum_sql(f"CASE WHEN p.p_type LIKE 'PROMO%' THEN {REVENUE_SQL} ELSE 0 END")}
             / {dsum_sql(REVENUE_SQL)} AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1996-02-01'
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped conditional revenue share: % of a month's revenue
    from PROMO parts. One dim join (part is SF-proportional: unhinted,
    AQE decides — r8 unhint); numerator and denominator come out of the
    same single aggregate pass (two conditional decimal sums), then one
    IEEE division — no second scan, no subquery."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    rev = revenue()
    agg = joined.agg(
        exact_sum(
            F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
        )
        .cast("double")
        .alias("promo_rev"),
        exact_sum(rev).cast("double").alias("total_rev"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias(
            "promo_revenue_pct"
        )
    )


@register(
    "disjunctive_part_revenue",
    tags=("join", "pushdown", "tpch:q19-shape"),
    oracle=f"""
SELECT {dsum_sql(REVENUE_SQL)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS line_count
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped OR-of-ANDs: three (brand, size, quantity) branches
    across both join sides. Catalyst factors the disjunction into
    single-side conjuncts — the part side gets `p_size >= 1 AND (brand IN
    …)`-style pushdown, lineitem gets the quantity envelope [1, 40] — so
    both scans prune BEFORE the join and the full predicate re-applies
    after. The classic test that disjunctions don't defeat pushdown.
    Part is SF-proportional: unhinted, AQE decides (r8 unhint)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    b = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.filter(b).agg(
        exact_sum(revenue()).cast("double").alias("revenue"),
        F.count("*").alias("line_count"),
    )


@register(
    "window_function_matrix",
    tags=("window", "matrix"),
    oracle="""
SELECT event_id, user_id,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       dense_rank() OVER w AS dr,
       ntile(4) OVER w AS quartile,
       first_value(value) OVER w AS first_v,
       last_value(value) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP) NULLS LAST, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_v,
       nth_value(value, 2) OVER (PARTITION BY user_id
                                 ORDER BY CAST(ts AS TIMESTAMP) NULLS LAST, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS second_v
FROM events
WHERE user_id % 25 = 0
-- CAST + NULLS LAST (review r5): Spark's asc default is NULLS FIRST vs
-- DuckDB's NULLS LAST (NULL-ts rows would shift every rank in the
-- partition), and raw ts would rank nano-precision where Spark floors to
-- micros; the Spark side pins asc_nulls_last to match
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) NULLS LAST, event_id)
""",
)
def window_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/navigation window surface in one query: percent_rank,
    cume_dist (running frames) and first/last/nth_value (full frames) per
    user timeline. Rank math is exact integer-ratio arithmetic — identical
    doubles on both engines; all windows share one user-keyed shuffle."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    running = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), "event_id"
    )
    full = running.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.percent_rank().over(running).alias("pr"),
        F.cume_dist().over(running).alias("cd"),
        F.dense_rank().over(running).alias("dr"),
        F.ntile(4).over(running).alias("quartile"),
        F.first("value").over(running).alias("first_v"),
        F.last("value").over(full).alias("last_v"),
        F.nth_value("value", 2).over(full).alias("second_v"),
    )


@register(
    "user_top3_value_mass",
    tags=("ext", "array", "hof"),
    oracle="""
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       list_reduce(
           CASE WHEN len(vals) >= 3 THEN vals[1:3] ELSE vals END,
           (x, y) -> x + y) AS top3_mass
FROM (
    SELECT user_id,
           list_sort(list(value), 'DESC') AS vals
    FROM events
    WHERE value IS NOT NULL
    GROUP BY user_id
)
""",
)
def user_top3_value_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order pipeline: per user, collect event values ->
    sort desc -> slice top 3 -> fold-sum, entirely in JVM array built-ins
    (collect_list + array_sort + slice + aggregate — no window, no second
    shuffle, no UDF). Fixed fold order over a deterministic sorted slice
    keeps the double bit-identical to the oracle's list_reduce."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    grouped = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("value"), asc=False).alias("vals")
    )
    top3 = F.slice(F.col("vals"), 1, 3)
    return grouped.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.aggregate(
            F.slice(top3, 2, 2),
            F.element_at(top3, 1),
            lambda acc, x: acc + x,
        ).alias("top3_mass"),
    )


@register(
    "customer_order_distribution",
    tags=("join", "outer", "tpch:q13-shape"),
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: LEFT OUTER join so zero-order customers survive
    with c_count=0, then a second aggregation over the first's output (a
    distribution of counts). The outer join's extra predicate lives in the
    join condition, not a WHERE (which would turn it inner). Second groupBy
    keys on ~tens of distinct counts -> map-side combine collapses it;
    only the per-customer agg moves real data."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "part_supplier_variety",
    tags=("join", "anti", "tpch:q16-shape"),
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#15'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 7, 10)
  -- IS NOT NULL on BOTH sides (review r5): NOT IN drops NULL keys only
  -- when the exclusion set is non-empty; the engine filters explicitly.
  -- The EXCLUSION set too (review r7): ONE NULL s_suppkey in the set
  -- makes NOT IN return UNKNOWN for every probe row (empty oracle)
  -- while the left_anti build side just matches nothing.
  AND l.l_suppkey IS NOT NULL
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0 AND s_suppkey IS NOT NULL)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: NOT IN over a non-null key compiles to a left-anti
    join against an exclusion set (suppliers in arrears stand in for the
    reference shape's complaint filter); part dim filtered before the
    join. Both sides are constant fractions of SF-proportional dims, so
    neither carries a broadcast hint — AQE broadcasts at bench scale and
    falls back to shuffle joins at 100 TB (r8 unhint)."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        t(spark, sf_dir, "supplier")
        # build-side IS NOT NULL mirrors the oracle's exclusion-set
        # filter (review r7): without it a NULL s_suppkey empties the
        # oracle's NOT IN while the anti-join shrugs it off
        .filter((F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull())
        .select("s_suppkey")
    )
    p = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#15")
            & ~F.col("p_type").startswith("MEDIUM")
            & F.col("p_size").isin(1, 4, 7, 10)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        # l_suppkey IS NOT NULL pins the NOT-IN contract in code (review
        # r5: with a non-empty exclusion set, SQL NOT IN drops NULL-key
        # rows — x NOT IN (...) is NULL — while left_anti keeps them)
        li.filter(F.col("l_suppkey").isNotNull())
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "lone_failed_supplier_orders",
    tags=("join", "subquery", "tpch:q21-shape"),
    oracle="""
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
""",
)
def lone_failed_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped double correlation (EXISTS + NOT EXISTS over the
    same fact), hand-decorrelated: one grouped pass over lineitem computes
    per-order distinct-supplier and distinct-returning-supplier counts;
    'another supplier exists' <=> nsupp >= 2, 'no other supplier returned'
    <=> nrsupp = 1 (l1 itself returns, so it is the only one). Two
    correlated self-joins collapse into one reusable aggregate joined on
    l_orderkey — at 100 TB that is one shuffle of (orderkey, 2 longs)
    instead of two full fact-fact semi-joins."""
    li = t(spark, sf_dir, "lineitem")
    ord_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("nrsupp"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(ord_stats, "l_orderkey")
        .filter((F.col("nsupp") >= 2) & (F.col("nrsupp") == 1))
        # supplier unhinted (review r7): SF-proportional dim; AQE decides
        .join(s, l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "idle_rich_customers",
    tags=("subquery", "anti", "tpch:q22-shape"),
    oracle=f"""
SELECT c.c_nationkey AS cntry,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {dsum_sql('c.c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c.c_acctbal > (
      SELECT {dsum_sql('c2.c_acctbal')} / COUNT(c2.c_acctbal)
      FROM customer c2
      WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
""",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: attribute-set filter (nationkey stands in for the
    phone prefix the reduced schema lacks), an uncorrelated scalar-avg
    subquery as the threshold, and NOT EXISTS orders as a left-anti join.
    The scalar rides a one-row broadcast cross join; the threshold avg is
    exact-decimal sum / count so both engines compare against the identical
    double. Anti-join probes only o_custkey (column-pruned)."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    c = t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    threshold = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (exact_sum("c_acctbal").cast("double") / F.count("c_acctbal")).alias(
                "avg_bal"
            )
        )
    )
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_sum("c_acctbal").cast("double").alias("totacctbal"),
        )
    )


@register(
    "nation_pair_trade_volume",
    tags=("join", "tpch:q7-shape"),
    oracle=f"""
SELECT n1.n_name AS cust_nation,
       n2.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       {dsum_sql(REVENUE_SQL)} AS volume
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY cust_nation, supp_nation, ship_year
""",
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: the nation dim joins twice under different roles
    (customer's vs supplier's) with a disjunctive pair predicate that only
    references both sides post-join. Each nation alias is pre-filtered to
    the two named rows, so the pair predicate drops to a residual over a
    4-row cross space while both dim joins broadcast; the facts meet in the
    one genuine shuffle (orders x lineitem on orderkey)."""
    pair = ["NATION_3", "NATION_7"]
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
        )
    )
    n2 = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
        )
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer unhinted: unfiltered largest dim (see
        # local_supplier_volume, review r5); AQE broadcasts at bench scale
        .join(c, o.o_custkey == c.c_custkey)
        # supplier unhinted (review r7): SF-proportional dim — a forced
        # broadcast is the 100 TB OOM class the r5 customer-unhint
        # removed; AQE still picks broadcast at bench scale
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return joined.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(exact_sum(revenue()).cast("double").alias("volume"))


@register(
    "daily_click_purchase_reconciliation",
    tags=("join", "outer", "full-outer", "events"),
    oracle=f"""
WITH clicks AS (
    SELECT CAST({fdiv_sql('epoch_us(CAST(ts AS TIMESTAMP))', 86_400_000_000)} AS BIGINT) AS day,
           COUNT(*) AS n_clicks,
           {dsum_sql('value')} AS click_value
    FROM events WHERE event_type = 'click' GROUP BY 1
),
purchases AS (
    SELECT CAST({fdiv_sql('epoch_us(CAST(ts AS TIMESTAMP))', 86_400_000_000)} AS BIGINT) AS day,
           COUNT(*) AS n_purchases,
           {dsum_sql('value')} AS purchase_value
    FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT COALESCE(c.day, p.day) AS day,
       c.n_clicks, c.click_value, p.n_purchases, p.purchase_value
FROM clicks c FULL OUTER JOIN purchases p ON c.day = p.day
""",
)
def daily_click_purchase_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the reconciliation shape: per-day click totals
    against per-day purchase totals, keeping days where EITHER side is
    absent (NULL-padded), the classic two-ledger comparison the other
    outer-join queries can't express. Day keys are exact integer epoch-day
    arithmetic; both inputs are pre-aggregated (day-cardinality), so the
    full-outer join is a merge of two tiny grouped sets — at 100 TB the
    shuffles are the two event-scans' map-side-combined groupBys, and the
    join itself moves only |days| rows per side."""
    ev = t(spark, sf_dir, "events")
    day = floor_bucket_us(86_400_000_000)

    def side(etype: str, n_name: str, v_name: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(day.alias("day"))
            .agg(
                F.count("*").alias(n_name),
                exact_sum("value").cast("double").alias(v_name),
            )
        )

    c = side("click", "n_clicks", "click_value")
    p = side("purchase", "n_purchases", "purchase_value")
    return (
        c.withColumnRenamed("day", "c_day")
        .join(p.withColumnRenamed("day", "p_day"),
              F.col("c_day") == F.col("p_day"), "full_outer")
        .select(
            F.coalesce("c_day", "p_day").alias("day"),
            "n_clicks", "click_value", "n_purchases", "purchase_value",
        )
    )


@register(
    "returnflag_multiset_ops",
    tags=("setop", "except-all", "intersect-all"),
    oracle="""
WITH r AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
a AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A')
SELECT 'except_all' AS op, l_orderkey, COUNT(*) AS n
FROM (SELECT * FROM r EXCEPT ALL SELECT * FROM a) GROUP BY 2
UNION ALL
SELECT 'intersect_all' AS op, l_orderkey, COUNT(*) AS n
FROM (SELECT * FROM r INTERSECT ALL SELECT * FROM a) GROUP BY 2
""",
)
def returnflag_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — the bag-semantic set ops (§2.7 EXT):
    per order key, surviving multiplicities of returned ('R') lines against
    accepted ('A') lines. ALL-semantics is the point: except_all keeps
    max(0, nR - nA) copies and intersect_all min(nR, nA) — duplicate-
    sensitive, unlike DISTINCT set ops. Catalyst rewrites both into ONE
    key-partitioned count aggregate + replicate generate (RewriteExceptAll/
    RewriteIntersectAll): no join, shuffle carries only (key, count) —
    bag reconciliation at fact scale for a groupBy's price."""
    li = t(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    ea = r.exceptAll(a).groupBy("l_orderkey").agg(F.count("*").alias("n"))
    ia = r.intersectAll(a).groupBy("l_orderkey").agg(F.count("*").alias("n"))
    return ea.select(F.lit("except_all").alias("op"), "l_orderkey", "n").unionByName(
        ia.select(F.lit("intersect_all").alias("op"), "l_orderkey", "n")
    )


def _order_snapshots(spark: SparkSession, sf_dir: str):
    """Shared old/new order-book snapshots for the CDC pair of queries:
    order_snapshot_diff AND incremental_status_rollup_cdc must see
    byte-identical snapshots (same window bounds, same +10% repricing) or
    the maintenance-equals-recompute proof silently breaks — one
    definition, not two copies (review r3)."""
    orders = t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderdate") < "1997-01-01").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderdate") >= "1996-01-01").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderstatus") == "O", F.col("o_totalprice") * F.lit(1.1)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return old, new


@register(
    "order_snapshot_diff",
    tags=("cdc", "join", "full-outer", "snapshot"),
    oracle=_cdc.diff_snapshots_oracle_sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
        "WHERE o_orderdate < TIMESTAMP '1997-01-01'",
        "SELECT o_orderkey, o_orderstatus, "
        "CASE WHEN o_orderstatus = 'O' THEN o_totalprice * CAST(1.1 AS DOUBLE) "
        "ELSE o_totalprice END AS o_totalprice FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01'",
        ["o_orderkey"],
        ["o_orderstatus", "o_totalprice"],
        # o_orderkey is the TPC-H primary key — the "absent" NULL-key
        # contract keeps the single-join scale plan (the multiset branch
        # measured +0.4 s on the CDC bench row for rows that cannot
        # exist); operators/cdc tests cover the multiset default
        null_keys="absent",
    ),
)
def order_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two keyed snapshots (operators/cdc.diff_snapshots): the
    pre-1997 order book vs a later snapshot where open ('O') orders were
    repriced +10% and the window advanced a year. Inserts (new-window
    orders), deletes (aged-out orders), updates (repriced overlap) fall out
    of ONE full-outer join on the key with null-safe column comparisons —
    no row hashing, so the same semantics reproduce on any engine. The
    companion write path is sources/versioned_sink.SnapshotTable (atomic
    manifest publish + time travel), tested in test_sources.py."""
    old, new = _order_snapshots(spark, sf_dir)
    return _cdc.diff_snapshots(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"],
        null_keys="absent",
    )


@register(
    "incremental_status_rollup_cdc",
    tags=("cdc", "incremental", "materialized-view"),
    bench=True,  # r4: the perf gate sees one snapshot/CDC family member
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice * CAST(1.1 AS DOUBLE) ELSE o_totalprice END")} AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY o_orderstatus
""",
    # The correctness oracle above deliberately RECOMPUTES from the new
    # snapshot — that asymmetry is the query's proof that the maintenance
    # algebra lands bit-identical to a rescan. For the perf co-measure it
    # would time maintenance-vs-recompute (different algorithms, and the
    # recompute is trivially cheaper at bench SFs where |changes| ~
    # |table|), so bench.py times this result-identical DuckDB twin of the
    # SAME maintenance pipeline instead (diff -> signed deltas -> fold);
    # parity with the recompute oracle is asserted in
    # tests/test_oracle_parity.py.
    bench_baseline_sql="""
WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice, TRUE AS _o
           FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
     n AS (SELECT o_orderkey, o_orderstatus,
                  CASE WHEN o_orderstatus = 'O'
                       THEN o_totalprice * CAST(1.1 AS DOUBLE)
                       ELSE o_totalprice END AS o_totalprice, TRUE AS _n
           FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
     j AS (SELECT o.o_orderstatus AS old_s, o.o_totalprice AS old_p,
                  n.o_orderstatus AS new_s, n.o_totalprice AS new_p, o._o, n._n
           FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey),
     base AS (SELECT old_s AS g, COUNT(*) AS n_orders,
                     SUM(CAST(old_p AS DECIMAL(38,6))) AS total_price
              FROM j WHERE _o GROUP BY 1),
     ch AS (SELECT *, CASE WHEN _o IS NULL THEN 'insert'
                           WHEN _n IS NULL THEN 'delete'
                           WHEN old_s IS DISTINCT FROM new_s
                                OR old_p IS DISTINCT FROM new_p
                           THEN 'update' END AS change
            FROM j),
     contrib AS (
       SELECT old_s AS g, -1 AS dc, CAST(-old_p AS DECIMAL(38,6)) AS dm
       FROM ch WHERE change IN ('delete', 'update')
       UNION ALL
       SELECT new_s, 1, CAST(new_p AS DECIMAL(38,6))
       FROM ch WHERE change IN ('insert', 'update')),
     deltas AS (SELECT g, SUM(dc) AS dc, SUM(dm) AS ds FROM contrib GROUP BY g)
SELECT COALESCE(base.g, deltas.g) AS o_orderstatus,
       COALESCE(n_orders, 0) + COALESCE(dc, 0) AS n_orders,
       CAST(CAST(COALESCE(total_price, 0) + COALESCE(ds, 0) AS VARCHAR) AS DOUBLE)
           AS total_price
FROM base FULL OUTER JOIN deltas ON base.g IS NOT DISTINCT FROM deltas.g
WHERE COALESCE(n_orders, 0) + COALESCE(dc, 0) > 0
""",
)
def incremental_status_rollup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-status order
    rollup is NOT recomputed from the new snapshot — it is maintained by
    folding CDC deltas (order_snapshot_diff's insert/delete/update rows)
    into the OLD snapshot's rollup (operators/cdc.maintain_rollup). The
    ORACLE is the direct recompute over the new snapshot, so the hash gate
    proves the maintenance algebra exact: signed exact-decimal
    contributions make (base + deltas) associative and bit-identical to
    the rescan. The reference full-refreshes its aggregates (OPT5) because
    they carry exact distincts; for the mergeable count/sum/avg core this
    is the O(|changes| + |groups|) alternative — at 100 TB, maintenance
    cost is independent of base-table size."""
    old, new = _order_snapshots(spark, sf_dir)
    base = old.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        exact_sum("o_totalprice").alias("total_price"),  # decimal — no cast
    )
    changes = _cdc.diff_snapshots(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"],
        null_keys="absent",  # TPC-H primary key (see order_snapshot_diff)
    )
    return _cdc.maintain_rollup(
        base,
        changes,
        "o_orderstatus",
        count_col="n_orders",
        sum_col="total_price",
        measure_col="o_totalprice",
    )


@register(
    "variant_props_rollup",
    tags=("json", "variant", "spark4"),
    oracle=_JSON_ROLLUP_ORACLE,
)
def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT tier of the semi-structured surface: props parsed ONCE
    into Spark 4's binary-encoded VariantType (parse_json), then accessed
    with typed paths (variant_get) — same result as json_props_rollup's
    per-call get_json_object, but the parse cost is paid once per row
    regardless of how many fields are later extracted, which is the shape
    that matters when a 100 TB event stream carries wide JSON payloads
    read by many downstream projections. Hash-checked against the same
    relational oracle as the string-JSON twin."""
    ev = t(spark, sf_dir, "events")
    return (
        # try_* forms (r9, --badjson sweep): parse_json raises
        # MALFORMED_RECORD_IN_PARSING on truncated JSON and variant_get
        # raises INVALID_VARIANT_CAST on a non-numeric k — both killed
        # the job; NULL is the contract for junk on every tier
        ev.select(F.try_parse_json("props").alias("v"), "value")
        .select(F.try_variant_get("v", "$.k", "int").alias("k_val"), "value")
        .groupBy("k_val")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").cast("double").alias("total_value"),
        )
    )


@register(
    "fuzzy_part_name_pairs",
    tags=("join", "fuzzy", "levenshtein", "blocking"),
    oracle="""
SELECT a.p_partkey AS key_a,
       b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM part a
JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
""",
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy string join (the last §2.8 EXT string function,
    levenshtein, in its real use): near-identical part names within a
    (brand, size) block at edit distance <= 4. Blocking is what makes
    fuzzy joins survive scale — the equi-join on the block key reduces
    O(n^2) comparisons to sum-of-block-squares, and levenshtein runs only
    on the surviving pairs, JVM-side; both engines implement the same
    classic edit distance, so the pair set and distances hash-match."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size", "p_name")
    a = p.select(
        F.col("p_brand").alias("b"), F.col("p_size").alias("s"),
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_brand").alias("b"), F.col("p_size").alias("s"),
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"),
    )
    return (
        a.join(b, ["b", "s"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 4)
        .select("key_a", "key_b", "edit_dist")
    )


@register(
    "weekly_cohort_retention",
    tags=("ext", "events", "cohort", "retention"),
    oracle=f"""
WITH activity AS (
    SELECT DISTINCT user_id,
           CAST({fdiv_sql('epoch_us(CAST(ts AS TIMESTAMP))', 604_800_000_000)} AS BIGINT) AS week_idx
    FROM events
),
cohorts AS (
    SELECT user_id, MIN(week_idx) AS cohort_week FROM activity GROUP BY user_id
)
SELECT c.cohort_week,
       CAST(a.week_idx - c.cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
FROM activity a
JOIN cohorts c ON c.user_id = a.user_id
GROUP BY c.cohort_week, week_offset
""",
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical product-analytics rollup the
    reference's per-user MIN(timestamp) 'first activity' column
    (aggregates.py:110) gestures at: users bucketed by first-active week,
    counted distinct per (cohort, weeks-since-cohort). Week index is exact
    integer epoch-µs arithmetic, so offsets are engine-portable. Plan: the
    (user, week) distinct and the per-user min share the user-keyed
    exchange; cohorts re-join activity UNHINTED (review r5: a forced
    broadcast of the |users|-cardinality cohorts side is unbounded at
    100 TB — and both sides already hash by user_id from the same
    exchange, so the shuffle join is co-partitioned and nearly free;
    AQE still broadcasts at bench scale), and the final group is
    cohort×offset-sized — at 100 TB only the first distinct touches
    event volume."""
    ev = t(spark, sf_dir, "events")
    week_idx = floor_bucket_us(604_800_000_000)
    activity = ev.select("user_id", week_idx.alias("week_idx")).distinct()
    cohorts = activity.groupBy("user_id").agg(
        F.min("week_idx").alias("cohort_week")
    )
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "frequently_copurchased_parts",
    tags=("join", "self-join", "affinity", "topk"),
    oracle="""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a,
       b.l_partkey AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM items a
JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 50
""",
)
def frequently_copurchased_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the top part pairs appearing in the same
    order. The self-join on the basket key is the canonical co-occurrence
    shape — pair volume is sum-of-basket-size-squares, bounded by small
    baskets (per-order item counts), NOT by table size, and the per-order
    distinct collapses duplicate part lines before pairs form. One
    orderkey exchange feeds both join sides (self-join reuse), the pair
    count is map-side combined, and TakeOrderedAndProject keeps top-50 a
    heap merge with a full deterministic tiebreak."""
    items = (
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(
            F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(50)
    )


@register(
    "copurchase_triangles",
    tags=("graph", "self-join", "triangles"),
    oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY u, v HAVING COUNT(*) >= 2
)
SELECT e1.u AS part_a, e1.v AS part_b, e2.v AS part_c
FROM edges e1
JOIN edges e2 ON e2.u = e1.v
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
""",
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the co-purchase graph (parts co-ordered in
    >= 2 orders): graph analytics over DERIVED edges, all relational. The
    id-ordered edge orientation (u < v everywhere) is the standard
    distributed-triangle trick — each triangle matches exactly once (no
    /6 dedup pass) and the join fan-out is bounded by forward-degree
    sums, not total-degree squares, which is what keeps the shape alive
    on power-law graphs. The edge list builds once and feeds all three
    join roles (Catalyst reuses the aggregate subtree); wedges form on
    the e1.v = e2.u exchange and close against a (u,v)-keyed edge probe."""
    items = (
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    e1 = edges.select(F.col("u").alias("part_a"), F.col("v").alias("part_b"))
    e2 = edges.select(F.col("u").alias("part_b"), F.col("v").alias("part_c"))
    e3 = edges.select(F.col("u").alias("part_a"), F.col("v").alias("part_c"))
    return e1.join(e2, "part_b").join(e3, ["part_a", "part_c"]).select(
        "part_a", "part_b", "part_c"
    )


@register(
    "region_nation_roster",
    tags=("agg", "string-agg", "listagg"),
    oracle="""
SELECT r.r_name AS region,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY region
""",
)
def region_nation_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL LISTAGG / string_agg): the roster
    column every report eventually wants. Spark has no ordered string_agg
    aggregate, so the portable form is array_join(sort_array(collect_list))
    — collect order is nondeterministic but the in-row sort fixes it, the
    same determinism move as user_event_transcripts. One dim-sized groupBy;
    at scale the caution is that the string grows with group size (keep it
    for dim-cardinality groups, not fact rollups)."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
        )
    )


@register(
    "monthly_revenue_growth",
    tags=("agg", "window", "period-over-period"),
    oracle=f"""
WITH m AS (
    SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS month_idx,
           {dsum_sql(REVENUE_SQL)} AS revenue
    FROM lineitem GROUP BY month_idx
)
SELECT month_idx, revenue,
       lag(revenue) OVER (ORDER BY month_idx NULLS LAST) AS prev_revenue,
       (revenue - lag(revenue) OVER (ORDER BY month_idx NULLS LAST))
           / lag(revenue) OVER (ORDER BY month_idx NULLS LAST) AS mom_growth
FROM m
""",
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth — the period-over-period report shape: the
    fact table collapses to one exact-decimal revenue row per month
    FIRST, then a lag window over that tiny aggregate computes the delta
    ratio. The global (unpartitioned) window is safe precisely because it
    runs on |months| rows, not the fact table — the single-partition sort
    that would be a scale bug on raw data is free on the rollup; the
    growth ratio is one subtraction + one division of identical doubles
    on both engines."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    m = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("month_idx")
    ).agg(exact_sum(revenue()).cast("double").alias("revenue"))
    # NULLS LAST explicitly on BOTH engines: Spark's asc default is
    # NULLS FIRST, DuckDB's is NULLS LAST — a NULL month (null shipdate
    # group) would shift the whole lag chain (NULL-injection sweep)
    w = Window.orderBy(F.col("month_idx").asc_nulls_last())
    prev = F.lag("revenue").over(w)
    return m.select(
        "month_idx",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev).alias("mom_growth"),
    )


@register(
    "json_props_typed_rollup",
    tags=("json", "from_json", "typed"),
    oracle=_JSON_ROLLUP_ORACLE,
)
def json_props_typed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TYPED-schema JSON tier (completing get_json_object ->
    from_json -> variant): props parsed with an explicit struct schema —
    the production path, because the declared schema moves type errors to
    parse time (malformed rows yield NULL fields instead of silently
    stringly-typed data) and Catalyst prunes unneeded struct fields out of
    the parse itself. Same rollup and oracle as the sibling tiers, so the
    three parsing strategies are provably value-identical."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", "k INT").alias("p"), "value"
    )
    return (
        parsed.groupBy(F.col("p.k").alias("k_val"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").cast("double").alias("total_value"),
        )
    )
