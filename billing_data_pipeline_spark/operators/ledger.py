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

import os
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

    def _versions_dir(self) -> str:
        return self.path + "_versions"

    def _pointer(self) -> str:
        return os.path.join(self._versions_dir(), "_current")

    def _current_dir(self) -> str | None:
        try:
            with open(self._pointer()) as f:
                name = f.read().strip()
        except OSError:
            return None
        d = os.path.join(self._versions_dir(), name)
        return d if os.path.isdir(d) else None

    def load(self) -> DataFrame:
        """Resolve via the atomic pointer; a ledger that has never been
        written is empty. Read failures of a POINTED-AT version RAISE —
        the old blanket except returned empty on any torn/transient state,
        silently discarding history and (inside record) persisting a
        ledger containing only the newest rows (review r4)."""
        cur = self._current_dir()
        if cur is None:
            # legacy single-dir layout (pre-r4) or never written
            if os.path.exists(self.path):
                return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(cur)

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
        # Small metadata table: collect-then-rewrite is safe because the
        # ledger is O(number of ingested files), not O(data). The rewrite
        # publishes a fresh immutable version dir and atomically renames
        # the pointer over _current — a crash mid-write leaves the old
        # version referenced, never a torn table (review r4: the previous
        # in-place mode('overwrite') deleted-then-wrote, and a crash
        # between the two lost the entire processed-files history).
        import tempfile
        import uuid

        out = merged.collect()
        vdir_name = f"v_{uuid.uuid4().hex}"
        vdir = os.path.join(self._versions_dir(), vdir_name)
        os.makedirs(self._versions_dir(), exist_ok=True)
        self.spark.createDataFrame(out, LEDGER_SCHEMA).coalesce(1).write.mode(
            "errorifexists"
        ).parquet(vdir)
        prev = self._current_dir()
        fd, tmp = tempfile.mkstemp(dir=self._versions_dir(), prefix="_ptr_")
        with os.fdopen(fd, "w") as f:
            f.write(vdir_name)
        os.replace(tmp, self._pointer())  # atomic publish
        if prev is not None:
            import shutil

            shutil.rmtree(prev, ignore_errors=True)
