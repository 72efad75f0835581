"""Shared helpers for plan modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def revenue() -> Column:
    """The lineitem measure standing in for billing credit_usage
    (FIXTURES.md §4: l_extendedprice/l_discount <-> credit_usage)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


REVENUE_SQL = "l_extendedprice * (1 - l_discount)"


def dsum_sql(expr: str) -> str:
    """Oracle-side exact-decimal SUM, matching operators.aggregates.exact_sum.

    The decimal -> double edge goes THROUGH VARCHAR: DuckDB's direct
    decimal->double cast divides the int128 payload by 10^scale in floating
    point (two roundings), which is off by 1 ulp from correct rounding once
    the decimal carries ~18+ significant digits (observed on a sum of
    squared prices); Spark's Decimal.toDouble (BigDecimal.doubleValue) is
    correctly rounded. Parsing the exact decimal string is correctly
    rounded in DuckDB too, so the two engines agree at every magnitude.

    The double -> decimal edge goes through VARCHAR for the same reason in
    the other direction (extreme sweep, r4): DuckDB's direct cast
    multiplies by 10^scale in floating point (999999999999.25 ->
    999999999999.250048) while Spark's Decimal(double) parses the
    shortest-repr string — VARCHAR reproduces Spark's semantics exactly,
    and is the identity wherever the direct cast was already right."""
    return f"CAST(CAST(SUM(CAST(CAST({expr} AS STRING) AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """Oracle-side AVG = exact-decimal SUM / non-null COUNT — one IEEE
    division of identical operands, bit-identical to measure_aggs' avg."""
    return f"({dsum_sql(expr)} / COUNT({expr}))"
