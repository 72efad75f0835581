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
    """Oracle-side exact-decimal SUM, matching operators.aggregates.exact_sum."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """Oracle-side AVG = exact-decimal SUM / non-null COUNT — one IEEE
    division of identical operands, bit-identical to measure_aggs' avg."""
    return f"({dsum_sql(expr)} / COUNT({expr}))"
