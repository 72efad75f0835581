"""JSONL source — the lingua franca of LLM training corpora (one JSON
document per line, usually gzipped in transit).

Spark's json reader IS a JSONL reader (each line = one record; multiline
only via option). Design points for 100 TB:

- **Explicit schema, never inference**: schema inference reads the whole
  input once before the real scan — at corpus scale that doubles the job.
  Same stance as the CSV source (SURVEY.md §1.3).
- **PERMISSIVE + _corrupt_record**: a torn/garbage line lands in the
  corrupt column instead of failing the task — per-record error
  containment, the row-level analogue of the reference's per-file
  try/except (OPT7, pipeline/assets/ingest.py:131-135).
- **.gz awareness**: gzip is NOT splittable — one .gz file = one task, so
  lake layout must keep gzipped shards at ~100-500 MB. zstd/bzip2 or
  uncompressed+many-files parallelize; the reader is the same either way
  (Hadoop codecs are resolved from the extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read JSONL (optionally .gz) with a declared schema and per-record
    corrupt containment. The returned frame includes ``_corrupt_record``
    (NULL for clean rows) when ``keep_corrupt``; callers split clean vs
    quarantine with one filter."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    df = reader.json(path)
    return df if keep_corrupt else df.drop(CORRUPT_COL)


def split_clean_corrupt(
    df: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantine_rows, cached_handle).

    The frame is cached first: Spark (by design, since 2.3) refuses
    queries that reference ONLY the internal corrupt-record column of a
    raw JSON scan (the pruned re-scan could not know which rows were
    corrupt), and quarantine counts/writes are exactly such queries.
    Caching the parsed batch is the Spark-documented pattern; in a real
    ingestion job the batch is written out immediately anyway, so the
    materialization is the write you were about to do.

    Cache OWNERSHIP is the caller's (review r7): call
    ``cached_handle.unpersist()`` after both sides are written —
    Spark's CacheManager never reclaims persisted frames on its own, so
    a per-micro-batch caller that skips the unpersist pins one full
    batch in executor storage per call for the session's lifetime. (The
    handle is returned explicitly because the clean side drops the
    corrupt column — unpersisting THAT frame would miss the cache
    entry.)"""
    df = df.cache()
    clean = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(df[CORRUPT_COL].isNotNull())
    return clean, quarantine, df
