"""Hive-partitioned parquet sink with dynamic partition overwrite.

The reference's sinks are whole-table DELETE+INSERT refreshes
(pipeline/assets/aggregates.py:31,96,163,226) over an embedded database;
at lake scale the equivalent layout is a Hive-partitioned parquet tree
(year=/month=/day= — the same layout the reference READS,
pipeline/s3_utils.py:372-404) where:

- writes route each row to its partition directory (`partitionBy`),
- a backfill of a date window rewrites ONLY the partitions it touches
  (`spark.sql.sources.partitionOverwriteMode=dynamic` — static mode would
  truncate the whole table, i.e. the reference's DELETE-all semantics;
  dynamic is the incremental one),
- readers get partition pruning for free (`PartitionFilters` on scans with
  partition-column predicates — SURVEY.md OPT1).

Small-files control: a REBALANCE-hint shuffle on the partition columns
before the write routes each partition's rows together — without it,
every upstream task writes a file into every partition it saw
(tasks × partitions files). At 100 TB with daily partitions this is the
difference between 365 files/year and millions; REBALANCE (vs hash
repartition) additionally lets AQE split a HOT partition across tasks
instead of funneling a 275 GB day through one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
    coalesce_per_partition: bool = True,
) -> None:
    """Write ``df`` as a Hive-partitioned parquet tree. With
    ``dynamic=True`` (the default) an overwrite replaces only the
    partitions present in ``df`` — the idempotent-backfill semantic; with
    ``dynamic=False`` Spark's static mode truncates the whole table first
    (the reference's full-refresh semantic, S8)."""
    # PER-WRITE writer option, not a session conf (review r5): the old
    # set/restore around the write raced concurrent writers on the same
    # session — another thread's static flip mid-plan turned a dynamic
    # backfill into a whole-table truncate.
    out = _route_to_partitions(df, partition_cols) if coalesce_per_partition else df
    (
        out.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic" if dynamic else "static")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def _route_to_partitions(df: DataFrame, partition_cols: list[str]) -> DataFrame:
    """Cluster rows by partition value for the small-files contract.

    REBALANCE, not repartition (review r7): hash repartition funnels each
    partition VALUE through exactly one task, and AQE can coalesce but
    never SPLIT a hash partition — a hot day in a daily layout becomes
    one straggler/OOM task writing one giant file. The REBALANCE hint
    keeps the one-file-per-partition goal but lets
    ``optimizeSkewsInRebalancePartitions`` split oversized partitions
    into maxPartitionBytes-sized tasks/files.

    No version gate (review r9): the r8 gate meant to serve pre-3.2
    builds, but its own probe (``df.sparkSession``) is only public from
    3.3 — the fallback could never execute on the builds it targeted —
    and pyproject declares ``pyspark>=4.0``, where the REBALANCE hint
    (3.2+) is always available. Dead branch dropped."""
    return df.hint("rebalance", *partition_cols)


def read_hive_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the tree back; partition columns materialize from directory
    names and predicates on them prune directories before listing files."""
    return spark.read.parquet(path)


def write_hive_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Partitioned write with `sortWithinPartitions` on ``sort_cols``:
    rows land clustered, so parquet row-group min-max stats on those
    columns become selective and point/range predicates skip whole row
    groups at read time (the poor man's z-order — exact for one sort key,
    which is the common case: timestamp or entity id). The sort is
    per-output-task, no extra shuffle beyond the partition routing."""
    (
        _route_to_partitions(df, partition_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        # per-write option, not a session conf — see write_hive_partitioned
        .option("partitionOverwriteMode", "dynamic" if dynamic else "static")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Small-files compaction: rewrite the tree so each partition holds one
    (AQE-sized) file, preserving the sorted layout if requested. The
    streaming ingest path appends a file per micro-batch; at 100 TB a
    periodic compaction pass is what keeps scan task counts (and the
    driver's file index) sane.

    Self-overwrite safety: the input is ``localCheckpoint``ed, which
    MATERIALIZES the rows and TRUNCATES lineage before any source file is
    replaced. A plain cache() is not enough — a lost cache block (executor
    death, eviction) would recompute its partition from the scan, whose
    files the overwrite has already deleted, silently mixing old and new
    rows. With truncated lineage a lost block fails the job cleanly
    instead (re-run the compaction); durable-checkpoint to reliable
    storage if even that retry is unacceptable."""
    # Partition values must round-trip VERBATIM (review r6): default
    # partition-column type inference canonicalizes numeric-looking
    # strings (month=01 -> int 1), and dynamic overwrite then writes a
    # NEW month=1/ directory while the old month=01/ survives — every
    # row of that partition duplicated by a 'no-op' compaction. Scoped
    # conf flip: the partition schema resolves eagerly at load.
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(infer_key, "true")
    spark.conf.set(infer_key, "false")
    try:
        # partition schema resolves EAGERLY here — restore the conf
        # before the (potentially minutes-long) checkpoint
        # materialization below, or every concurrent reader planning a
        # partition-pruned scan on this session sees string-typed
        # year/month/day for the whole window (review r7; same
        # set/restore race class the r5 note above removed for
        # partitionOverwriteMode)
        df = spark.read.parquet(path)
    finally:
        spark.conf.set(infer_key, prev)
    df = df.localCheckpoint(eager=True)
    if sort_cols:
        write_hive_partitioned_sorted(df, path, partition_cols, sort_cols)
    else:
        write_hive_partitioned(df, path, partition_cols)
