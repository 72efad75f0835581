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


def floor_bucket_us(d: int, ts_col: str = "ts") -> Column:
    """Spark-side twin of fdiv_sql: exact integer FLOOR division of a
    timestamp column's epoch-µs by a positive literal — the one bucketing
    rule (matches F.window) shared by every day/week/window site. Bare
    ``div`` truncates toward zero (merges the two buckets around 1970) and
    ``F.floor(us / d)`` goes through a double, which is only exact while
    |us| < 2^53 (fails by year 9999 at 2.5e17 µs); subtracting the
    positive pmod first keeps it all-integer and exact at any magnitude
    (timewarp sweep + code review, r4)."""
    us = f"unix_micros({ts_col})"
    return F.expr(f"({us} - pmod({us}, {d})) div {d}")


def fdiv_sql(x: str, d: int) -> str:
    """Oracle-side EXACT floor division of an integer expression by a
    positive integer literal. DuckDB's ``//`` (and BIGINT casts of a
    quotient) truncate toward ZERO, but time bucketing floors — Spark's
    window()/floor() put epoch -1 µs in bucket -1 while ``x // d`` puts it
    in bucket 0, merging the two buckets around 1970 (timewarp sweep, r4).
    All-integer (no double-division ulp hazard at |x| ~ 8e15):
    subtract the positive modulus, then the division is exact."""
    return f"(({x}) - ((({x}) % {d}) + {d}) % {d}) // {d}"


def de_instrument_sql(sql: str) -> str:
    """Strip the parity-only per-row DOUBLE->STRING->DECIMAL route from an
    oracle, yielding the natural DuckDB query for TIMING purposes.

    ``CAST(CAST(expr AS STRING) AS DECIMAL(p,s))`` exists in oracles solely
    so DuckDB reproduces Spark's shortest-repr double->decimal semantics on
    >15-significant-digit inputs (see dsum_sql). On the bench tables the two
    forms are result-identical (every value is an exact-binary or
    few-digit decimal — asserted per bench query in
    tests/test_oracle_parity.py), but the string round-trip costs DuckDB
    10-100x on scan-heavy sums, which would inflate the co-measured
    baseline in Spark's favor. bench.py therefore times the
    de-instrumented form. Paren-aware (regex can't see nesting): only an
    inner cast whose payload ends with `` AS STRING`` and whose outer cast
    targets DECIMAL is rewritten; the per-GROUP decimal->double VARCHAR
    edge (group-cardinality cost, and needed for the 1-ulp divide trap)
    is left alone."""
    marker = "CAST(CAST("
    out = sql
    i = 0
    while True:
        i = out.find(marker, i)
        if i < 0:
            return out
        inner_open = i + len(marker) - 1
        depth = 0
        k = -1
        for j in range(inner_open, len(out)):
            if out[j] == "(":
                depth += 1
            elif out[j] == ")":
                depth -= 1
                if depth == 0:
                    k = j
                    break
        if k < 0:
            return out  # unbalanced; leave untouched
        payload = out[inner_open + 1 : k]
        if not payload.endswith(" AS STRING") or not out[k + 1 :].lstrip().startswith(
            "AS DECIMAL"
        ):
            i += 1  # e.g. the outer ...AS STRING) AS DOUBLE edge — keep
            continue
        expr = payload[: -len(" AS STRING")]
        # find the OUTER cast's closing paren (matches the paren at i+4)
        depth = 0
        m = -1
        for j in range(i + 4, len(out)):
            if out[j] == "(":
                depth += 1
            elif out[j] == ")":
                depth -= 1
                if depth == 0:
                    m = j
                    break
        if m < 0:
            return out
        out = out[:i] + "CAST(" + expr + out[k + 1 : m + 1] + out[m + 1 :]
        # restart scan at the rewritten site (nested patterns shift left)
