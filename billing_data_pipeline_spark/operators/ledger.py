"""Processed-files ledger (SURVEY.md §2.9 ST5, §4 OPT2).

The reference keeps a ``processed_files`` table (filename PRIMARY KEY,
file_hash, processed_at, record_count — reference: pipeline/assets/
ingest.py:164-172) and skips any file whose (filename, md5) is already
recorded, reprocessing when the hash changed (ingest.py:217-231).

Here the ledger is a small parquet table. File hashes are computed
*distributed* via Spark's binaryFile source + ``md5()`` — executors read the
bytes, the driver only sees (path, hash) pairs — so hashing scales with the
cluster instead of looping on one node like the reference's hashlib loop
(ingest.py:218-220).

In Structured Streaming mode the checkpointed file index subsumes
name-based skipping; this ledger remains the *content*-hash layer for
modified-in-place redetection, which Spark's file source does not do
(SURVEY.md §2.9 ST2 divergence note).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("file_hash", T.StringType(), False),
        T.StructField("processed_at", T.TimestampType(), False),
        T.StructField("record_count", T.LongType(), False),
    ]
)


def ledger_key(path):
    """Scheme-normalized FULL path — the ledger key.

    Basenames collide across Hive partitions (every partition's file is
    named ``billing.csv`` under ``year=*/month=*/day=*/``), so a
    basename-keyed ledger would evict every other partition's entry on each
    upsert and silently break the skip-unchanged contract (OPT2/ST5). The
    reference sidesteps this by renaming downloads to partition-qualified
    local names (reference: pipeline/s3_utils.py:189); with no download
    step here, the full path IS the partition-qualified name. The URI
    scheme is stripped so ``binaryFile``'s ``path`` and
    ``input_file_name()`` (which may render ``file:/`` vs ``file:///``)
    normalize to the same key.
    """
    return F.regexp_replace(path, "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")


def hash_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """(filename, file_hash) for every input file, hashed on executors.

    ``filename`` is the partition-qualified ``ledger_key`` of the path,
    not the basename (see ``ledger_key``).
    """
    return (
        spark.read.format("binaryFile")
        .load(paths)
        .select(
            ledger_key(F.col("path")).alias("filename"),
            F.md5(F.col("content")).alias("file_hash"),
        )
    )


class FileLedger:
    """Parquet-backed processed-files ledger with hash-aware skip."""

    def __init__(self, spark: SparkSession, ledger_path: str):
        self.spark = spark
        self.path = ledger_path

    def load(self) -> DataFrame:
        try:
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def filter_unprocessed(self, candidates: DataFrame) -> DataFrame:
        """Anti-join candidates (filename, file_hash) against the ledger.

        A file re-appears for processing when its name is new OR its hash
        changed — i.e. skip only exact (filename, file_hash) matches,
        matching the reference's skip/reprocess split (ingest.py:223-231).
        """
        return candidates.join(
            self.load().select("filename", "file_hash"),
            on=["filename", "file_hash"],
            how="left_anti",
        )

    def record(self, processed: list[tuple[str, str, int]]) -> None:
        """Upsert (filename, file_hash, record_count) rows, latest wins."""
        if not processed:
            return
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        rows = [(f, h, now, n) for f, h, n in processed]
        update = self.spark.createDataFrame(rows, LEDGER_SCHEMA)
        merged = (
            self.load()
            .join(update.select("filename"), on="filename", how="left_anti")
            .unionByName(update)
        )
        # Small metadata table: one-file overwrite. Collect-then-rewrite is
        # safe because the ledger is O(number of ingested files), not O(data).
        out = merged.collect()
        self.spark.createDataFrame(out, LEDGER_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(self.path)
