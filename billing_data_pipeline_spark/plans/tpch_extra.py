"""[EXT] Remaining TPC-H query shapes (Q2/Q6/Q8/Q9/Q10/Q12/Q20), adapted to
the driver's slimmed star schema (no partsupp, no commit/receipt dates —
TESTDATA.md). Together with plans/relational.py this completes coverage of
every TPC-H plan shape expressible on these tables: pure filter-aggregate
pushdown (Q6), argmin join-back (Q2), market-share ratio-of-sums (Q8),
multi-dim profit rollup (Q9), top-k by returned revenue (Q10), dual
conditional aggregate (Q12), and nested grouped-HAVING semi-join (Q20).

The reference has none of these (its only join is the dedup anti-join,
pipeline/assets/ingest.py:248-257); they are the analytical surface a
billing engine needs at scale, expressed so Catalyst gets broadcast dims,
partial aggregation, and pushed-down scan predicates.

Determinism contract (PLANS.md): money/quantity sums accumulate in
DECIMAL(30,6) via exact_sum and cast to double only at the output edge;
ratios are one IEEE division of identical operands on both engines; every
ordered output carries a deterministic tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import exact_sum
from ..registry import register
from ._util import REVENUE_SQL, dsum_sql, revenue, t


@register(
    "discounted_revenue",
    tags=("filter", "agg", "pushdown", "tpch:q6-shape"),
    bench=True,
    oracle=f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS promo_savings,
       CAST(COUNT(*) AS BIGINT) AS line_count
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped pure filter-aggregate: no join, no groupBy key — the
    whole query is scan-side. All four predicates push into the parquet
    scan (PushedFilters on l_shipdate/l_discount/l_quantity), so at 100 TB
    row-group min-max stats skip most of the table and the aggregate is a
    single map-side partial + one-row exchange."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount"))
        .cast("double")
        .alias("promo_savings"),
        F.count("*").alias("line_count"),
    )


@register(
    "cheapest_supplier_per_part",
    tags=("join", "subquery", "argmin", "tpch:q2-shape"),
    oracle="""
WITH unit AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_price
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
win AS (
    SELECT l_partkey, unit_price,
           MIN(unit_price) OVER (PARTITION BY l_partkey) AS best_price
    FROM unit
)
SELECT l_partkey AS partkey,
       best_price,
       CAST(COUNT(*) AS BIGINT) AS suppliers_at_best
FROM win
WHERE unit_price = best_price
GROUP BY partkey, best_price
ORDER BY partkey
LIMIT 100
""",
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated-min (argmin), on lineitem in place of the
    absent partsupp: per (part, supplier) minimum effective unit price,
    then the suppliers achieving the per-part global min. The correlated
    scalar min is a window-min instead of a grouped-min join-back: after
    the map-side-combined groupBy shuffle, only the distinct (part,
    supplier) pairs move again to cluster on l_partkey, and from there
    HashPartitioning(l_partkey) satisfies the window, the filter, and the
    regroup — no further exchange. The join-back formulation costs two
    extra exchanges because its join key widens to include the float
    value.
    unit_price is one IEEE division of identical stored doubles on both
    engines and MIN is order-insensitive, so the equality filter is
    bit-exact."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("up"),
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(F.min("up").alias("unit_price"))
    win = unit.withColumn(
        "best_price", F.min("unit_price").over(Window.partitionBy("l_partkey"))
    )
    return (
        win.filter(F.col("unit_price") == F.col("best_price"))
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("best_price"))
        .agg(F.count("*").alias("suppliers_at_best"))
        .orderBy("partkey")
        .limit(100)
    )


@register(
    "nation_market_share",
    tags=("join", "agg", "ratio", "tpch:q8-shape"),
    oracle=f"""
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       ({dsum_sql(f"CASE WHEN n2.n_name = 'NATION_2' THEN {REVENUE_SQL} ELSE 0 END")}
        / {dsum_sql(REVENUE_SQL)}) AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_year
ORDER BY o_year
""",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: within the ASIA PROMO market, the
    fraction of revenue supplied by NATION_2, per order year. Dim chains
    are pre-flattened into fact-facing key sets; join strategy is left to
    AQE (broadcast at bench scale, shuffle at 100 TB — the dims are
    SF-proportional). The
    share is a ratio of two exact-decimal sums over the *same* grouped
    rows (conditional numerator), cast to double for one IEEE division —
    bit-identical on both engines."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    # Pre-join each dim chain into ONE fact-facing side: market customers
    # (customer⋈nation⋈region, ASIA only), supplier→nation, filtered part —
    # collapsing the snowflake into its fact-facing keys is the standard
    # star-schema flattening and costs nothing at any scale.
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_market = (
        t(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    # No broadcast hints on cust_market / supp_nation / part: each is
    # SF-proportional (region-filtered customers, all suppliers, PROMO
    # parts all grow linearly with SF). AQE broadcasts them at bench
    # scale unhinted; at 100 TB a forced broadcast would OOM (r8 unhint).
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_market, o.o_custkey == F.col("c_custkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
    )
    rev = revenue()
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                exact_sum(
                    F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0))
                ).cast("double")
                / exact_sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "product_profit_by_nation",
    tags=("join", "agg", "tpch:q9-shape"),
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       {dsum_sql(f"{REVENUE_SQL} - 0.01 * p.p_retailprice * l.l_quantity")} AS profit
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit rollup by supplier nation x order year, with
    0.01*p_retailprice*l_quantity standing in for the absent
    ps_supplycost. The p_name LIKE filter cannot push into parquet stats
    (substring match) but prunes the part dim before the join; dims are
    SF-proportional so join strategy is left to AQE."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    supp_nation = (
        t(spark, sf_dir, "supplier")
        .join(
            t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    # supp_nation (all suppliers) and p (LIKE-filtered part) grow with SF:
    # no broadcast hint — AQE decides (broadcast at bench scale, shuffle
    # at 100 TB). r8 unhint pass.
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .join(
            p.select("p_partkey", "p_retailprice"),
            li.l_partkey == F.col("p_partkey"),
        )
    )
    amount = revenue() - F.lit(0.01) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(exact_sum(amount).cast("double").alias("profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@register(
    "returned_revenue_customers",
    tags=("join", "topk", "tpch:q10-shape"),
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       {dsum_sql(REVENUE_SQL)} AS lost_revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, nation
ORDER BY lost_revenue DESC, c.c_custkey ASC
LIMIT 20
""",
)
def returned_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: customers who returned the most revenue in a
    quarter, top-20. Both scans pre-filtered (quarter on orders,
    returnflag pushed into the lineitem scan); nation broadcast (bounded);
    customer unhinted — it is the largest dim and SF-proportional, so AQE
    picks the strategy (r8 unhint). TakeOrderedAndProject keeps the top-k
    a per-partition heap merge, never a global sort. c_custkey is the
    deterministic tiebreak."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(exact_sum(revenue()).cast("double").alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "priority_lines_by_status",
    tags=("join", "agg", "conditional", "tpch:q12-shape"),
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
)
def priority_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped dual conditional count (l_linestatus in place of
    the absent l_shipmode): lines shipped in a year, split by whether the
    order was high-priority. Integer conditional sums — no float hazard.
    The year filter pushes to the lineitem scan; the 2-key group collapses
    map-side, so shuffle volume is constant regardless of input size."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "dominant_part_suppliers",
    tags=("join", "semi", "subquery", "having", "tpch:q20-shape"),
    oracle=f"""
WITH per_supp AS (
    SELECT l.l_partkey, l.l_suppkey,
           {dsum_sql('l.l_quantity')} AS supp_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE 'small%'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_partkey, l.l_suppkey
),
per_part AS (
    SELECT l_partkey, CAST(CAST(SUM(CAST(CAST(supp_qty AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS part_qty
    FROM per_supp GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT ps.l_suppkey
    FROM per_supp ps
    JOIN per_part pp ON ps.l_partkey = pp.l_partkey
    WHERE ps.supp_qty > 0.3 * pp.part_qty
)
ORDER BY s.s_suppkey
""",
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped nested subquery chain: suppliers who shipped more
    than 30% of any 'small' part's 1996 volume. Two stacked grouped
    subplans share the l_partkey partitioning (the second groupBy and the
    join-back reuse the first shuffle's layout), the threshold comparison
    is HAVING-style on exact-decimal sums, and the final IN collapses to
    a left-semi join into the broadcast-sized supplier dim."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    # p is a LIKE-filtered slice of part (SF-proportional): no broadcast
    # hint, AQE decides (r8 unhint pass).
    per_supp = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(exact_sum("l_quantity").cast("double").alias("supp_qty"))
    )
    per_part = per_supp.groupBy("l_partkey").agg(
        exact_sum("supp_qty").cast("double").alias("part_qty")
    )
    dominant = (
        per_supp.join(per_part, "l_partkey")
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
