"""Mergeable incremental aggregation (SURVEY.md §4 OPT5 alternative).

The reference recomputes every aggregate table from all raw data on each
run because exact COUNT(DISTINCT) cannot be merged (aggregates.py:30-31).
That full refresh is O(history) per run — fine at GB scale, not at 100 TB.
This module provides the incremental path: per-batch PARTIAL aggregates
whose components are all mergeable —

- COUNT / SUM(decimal): merged by summing,
- distinct counts: Apache DataSketches HLL sketches (``hll_sketch_agg`` /
  ``hll_union_agg`` built-ins), merged losslessly w.r.t. sketch state,

so a new batch folds into the rollup in O(batch + groups), never O(history).
Estimates replace exact distincts (documented trade; the full-refresh exact
path in pipeline.py stays the oracle-checked default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggregates import MEASURE_DECIMAL


def partial_profile(
    df: DataFrame,
    group_cols: list[str],
    measure: Column | str,
    distinct_cols: dict[str, str] | None = None,
) -> DataFrame:
    """One mergeable partial-aggregate row per group for a batch."""
    m = F.col(measure) if isinstance(measure, str) else measure
    aggs = [
        F.count(F.lit(1)).alias("transaction_count"),
        # non-NULL measure count, carried separately: the exact twin's AVG
        # divides by COUNT(measure), not COUNT(*) — with NULL measures the
        # two differ, and the old transaction_count divisor silently
        # diverged from grouped_profile (review r4)
        F.count(m).alias("_measure_count"),
        F.sum(m.cast(MEASURE_DECIMAL)).alias("_sum_dec"),
    ]
    for alias, col in (distinct_cols or {}).items():
        aggs.append(F.hll_sketch_agg(col).alias(f"_hll_{alias}"))
    return df.groupBy(*group_cols).agg(*aggs)


def merge_partials(
    partials: DataFrame,
    group_cols: list[str],
    distinct_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Fold any number of partial rows per group into one (sum counts/sums,
    union HLL sketches) — associative and commutative, so batches can merge
    in any order, any grouping, across any number of runs.

    Schema compatibility: v1 partial tables (persisted before the r4 AVG
    fix) carry no ``_measure_count`` column — those merge with
    ``transaction_count`` standing in for it, which reproduces exactly the
    COUNT(*)-divisor average v1 computed (advice r4: a hard missing-column
    error here would brick the cross-run merge this module exists for)."""
    if "_measure_count" not in partials.columns:
        partials = partials.withColumn(
            "_measure_count", F.col("transaction_count")
        )
    aggs = [
        F.sum("transaction_count").alias("transaction_count"),
        F.sum("_measure_count").alias("_measure_count"),
        F.sum("_sum_dec").alias("_sum_dec"),
    ]
    for alias in (distinct_cols or {}):
        aggs.append(F.hll_union_agg(f"_hll_{alias}").alias(f"_hll_{alias}"))
    return partials.groupBy(*group_cols).agg(*aggs)


def finalize_profile(
    merged: DataFrame, distinct_cols: dict[str, str] | None = None
) -> DataFrame:
    """Partial state -> presentation columns (same shape as the exact
    grouped_profile: count, total, avg, distinct estimates)."""
    total = F.col("_sum_dec").cast("double")
    out = merged.withColumn("total_usage", total).withColumn(
        # divide by the NON-NULL measure count — AVG semantics, matching
        # the exact grouped_profile twin (review r4); a group whose
        # measures are all NULL gets NULL avg, exactly as AVG does
        "avg_usage",
        F.when(
            F.col("_measure_count") > 0, total / F.col("_measure_count")
        ),
    )
    for alias in (distinct_cols or {}):
        out = out.withColumn(alias, F.hll_sketch_estimate(f"_hll_{alias}"))
    drop = ["_sum_dec", "_measure_count"] + [
        f"_hll_{a}" for a in (distinct_cols or {})
    ]
    return out.drop(*drop)
