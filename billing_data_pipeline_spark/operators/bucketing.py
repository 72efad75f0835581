"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4 scale notes).

A repeated big-big equi-join (e.g. orders x lineitem every pipeline run)
pays a full shuffle of both sides each time. Writing both tables bucketed
(and sorted) by the join key pre-shuffles them ONCE at write time; every
subsequent sort-merge join reads co-located buckets with no Exchange and no
Sort in the plan. This is the batch analogue of co-partitioned state and
the standard amortization at 100 TB: shuffle once, join many times.

Buckets also bound memory: n_buckets sets per-task input size regardless of
total table size (pick so each bucket fits an executor's memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and per-bucket sorted) by the join key.

    Bucketing requires the session catalog (``saveAsTable``): bucket
    metadata lives in the table definition, which is what lets the planner
    elide the Exchange on later joins.
    """
    # One shuffle on the bucket key BEFORE the write (review r6): without
    # it every upstream task emits a file per bucket it touches — up to
    # tasks x n_buckets small files (the exact explosion
    # partitioned_sink.py documents); repartitioned, each bucket's rows
    # land in one task = one file per bucket.
    df = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables; with matching bucket specs the
    physical plan is a SortMergeJoin with NO Exchange (verified in tests).
    The merge hint forbids a broadcast from hiding the co-location."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
