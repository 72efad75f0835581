"""SQL entry-point parity (SURVEY.md §3 lifecycle): the engine accepts raw
ANSI SQL via ``spark.sql`` over registered table views — and for these
queries the SPARK TEXT IS THE ORACLE TEXT, verbatim. One dialect-neutral
string, two engines, hash-identical results: the strongest possible parity
statement for the SQL surface.

(The reference's whole query layer was SQL strings handed to DuckDB; here
the same strings run on Catalyst.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.tables import register_views

# Dialect-neutral subset used: year/month(), CAST, DECIMAL accumulators,
# CASE WHEN, JOIN/GROUP BY/ORDER BY/LIMIT — parse identically on Spark 4
# and DuckDB.

PRICING_SUMMARY_SQL = """
SELECT l_returnflag,
       l_linestatus,
       COUNT(*) AS count_order,
       CAST(CAST(SUM(CAST(CAST(l_quantity AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS sum_charge,
       (CAST(CAST(SUM(CAST(CAST(l_quantity AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) / COUNT(l_quantity)) AS avg_qty,
       (CAST(CAST(SUM(CAST(CAST(l_discount AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) / COUNT(l_discount)) AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

RETURNED_ITEM_SQL = """
SELECT c.c_custkey,
       c.c_name,
       CAST(CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS revenue,
       n.n_name AS nation
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


def _sql_query(sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        # The shared string carries the CAST(x AS STRING)->DECIMAL shim so
        # DuckDB reproduces Spark's shortest-repr double->decimal cast on
        # >15-significant-digit inputs. On SPARK the shim IS the native
        # cast (Decimal(double) goes through Double.toString) — identical
        # results, so the executor runs the de-instrumented form and skips
        # the per-row string round-trip the shim would cost it.
        from ._util import de_instrument_sql

        return spark.sql(de_instrument_sql(sql))

    return fn


@register(
    "sql_pricing_summary",
    tags=("sql-api", "tpch:q1-shape", "shared-text"),
    bench=True,
    oracle=PRICING_SUMMARY_SQL,
)
def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary executed from RAW SQL TEXT on Spark —
    and the oracle runs the identical text on DuckDB (shared-text parity)."""
    return _sql_query(PRICING_SUMMARY_SQL)(spark, sf_dir)


@register(
    "sql_returned_items",
    tags=("sql-api", "tpch:q10-shape", "shared-text"),
    oracle=RETURNED_ITEM_SQL,
)
def sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item revenue report (two fact joins + dim +
    top-k) from shared SQL text — fact-fact join shuffles on the join key,
    dims broadcast, TakeOrderedAndProject caps the sort."""
    return _sql_query(RETURNED_ITEM_SQL)(spark, sf_dir)


GROUPING_SETS_SQL = """
SELECT o_orderstatus,
       o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       COUNT(*) AS order_count,
       CAST(CAST(SUM(CAST(CAST(o_totalprice AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
HAVING COUNT(*) > 0
ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
"""


@register(
    "sql_grouping_sets",
    tags=("sql-api", "grouping-sets", "shared-text"),
    oracle=GROUPING_SETS_SQL,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers from shared SQL text
    (complements the DataFrame-side cube/rollup queries): one Expand over
    three grouping arrangements, single aggregate pass — NULL group labels
    disambiguated by the grouping flags on both engines identically."""
    return _sql_query(GROUPING_SETS_SQL)(spark, sf_dir)


LATERAL_TOP_ORDERS_SQL = """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 2
) o
WHERE c.c_custkey % 10 = 0
ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
"""


@register(
    "sql_lateral_top_orders",
    tags=("sql-api", "lateral", "shared-text"),
    oracle=LATERAL_TOP_ORDERS_SQL,
)
def sql_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery from shared SQL text: each customer's
    top-2 orders by price — the "top-N per entity" idiom in its SQL-standard
    form, parsed and planned by both engines from the identical string.
    Catalyst decorrelates the per-row LIMIT into a ranked window join (plan
    shows Window + the c_custkey equi-join, not a per-customer re-scan), so
    the lateral costs one fact shuffle at any scale — semantically the
    DataFrame-side latest_event_per_user/QUALIFY pattern, here proven at
    the raw-SQL entry point."""
    return _sql_query(LATERAL_TOP_ORDERS_SQL)(spark, sf_dir)


CUBE_ROLLUP_SQL = """
SELECT GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(CAST(l_quantity AS STRING) AS DECIMAL(30,6))) AS STRING) AS DOUBLE)
           AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
HAVING COUNT(*) > 0
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


@register(
    "sql_cube_quantities",
    tags=("sql-api", "cube", "shared-text"),
    oracle=CUBE_ROLLUP_SQL,
)
def sql_cube_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) from shared SQL text — all four
    grouping arrangements (full, per-flag, per-status, grand total) in ONE
    Expand + aggregate pass; GROUPING() flags disambiguate NULL labels
    identically on both engines, and the exact-decimal sums keep every
    subtotal bit-identical across the 4x row expansion."""
    return _sql_query(CUBE_ROLLUP_SQL)(spark, sf_dir)
