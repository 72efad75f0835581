"""Processed-files ledger (SURVEY.md §2.9 ST5, §4 OPT2).

The reference keeps a ``processed_files`` table (filename PRIMARY KEY,
file_hash, processed_at, record_count — reference: pipeline/assets/
ingest.py:164-172) and skips any file whose (filename, md5) is already
recorded, reprocessing when the hash changed (ingest.py:217-231).

Here the ledger is a small parquet table. File hashes are computed
*distributed*: executors stream each file through md5 in bounded chunks
(pyarrow filesystem streams inside a mapInPandas kernel), the driver only
sees (path, hash) pairs — so hashing scales with the cluster instead of
looping on one node like the reference's hashlib loop (ingest.py:218-220),
and, unlike a ``binaryFile`` + ``md5(content)`` scan, never materializes a
whole file as one row value (review r5: binaryFile caps a column at
Int.MaxValue bytes, so one >=2 GiB input failed the whole ingest — the
reference's streamed loop handled it fine).

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

_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*:/+"


def ledger_key(path):
    """Scheme-normalized FULL path — the ledger key.

    Basenames collide across Hive partitions (every partition's file is
    named ``billing.csv`` under ``year=*/month=*/day=*/``), so a
    basename-keyed ledger would evict every other partition's entry on each
    upsert and silently break the skip-unchanged contract (OPT2/ST5). The
    reference sidesteps this by renaming downloads to partition-qualified
    local names (reference: pipeline/s3_utils.py:189); with no download
    step here, the full path IS the partition-qualified name. The URI
    scheme is stripped so every render (``file:/`` vs ``file:///`` vs a
    bare path) normalizes to the same key.
    """
    return F.regexp_replace(path, _SCHEME_RE, "/")


def hash_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """(filename, file_hash) for every input file, hashed on executors in
    STREAMED chunks — O(8 MB) memory per task regardless of file size.

    ``filename`` is the partition-qualified ``ledger_key`` of the path,
    not the basename (see ``ledger_key``). Globs are expanded driver-side
    (one listing, same as binaryFile's); the hash work distributes one
    file per row across the cluster via pyarrow's filesystem layer
    (local + s3/gcs where pyarrow has credentials).
    """
    import glob as _glob
    import re

    from collections.abc import Iterator

    import pandas as pd

    expanded: list[str] = []
    for p in paths:
        bare = re.sub(_SCHEME_RE, "/", p) if p.startswith("file:") else p
        if re.match(_SCHEME_RE, bare):
            expanded.append(bare)  # remote scheme: no local glob
        else:
            # existence-first (review r7): a CONCRETE filename containing
            # glob metachars — 'billing[v2].csv' from lake.inputFiles() —
            # must not be expanded as a character class (glob returned []
            # and the file was silently never ingested); only a
            # non-existent path with metachars is a pattern.
            if any(c in bare for c in "*?[") and not os.path.exists(bare):
                hits = sorted(_glob.glob(bare))
            else:
                hits = [bare]
            # abspath here, not just at open time (advice r5): the hit is
            # recorded verbatim as the ledger filename, and a RELATIVE
            # local path would yield a relative ledger key that can never
            # match ingest's absolute ledger_key(input_file_name()) keys —
            # silently defeating hash-skip.
            expanded.extend(os.path.abspath(h) for h in hits)

    schema = T.StructType(
        [
            T.StructField("filename", T.StringType(), False),
            T.StructField("file_hash", T.StringType(), False),
        ]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from pyarrow import fs as pafs

        for pdf in it:
            names, hashes = [], []
            for p in pdf["path"]:
                # Hadoop spells S3 "s3a://" (the only scheme Spark's
                # reader accepts) but pyarrow's filesystem layer only
                # knows "s3://" — map it or every remote ingest dies at
                # the ledger-hash step with ArrowInvalid (review r6).
                # abfss:// -> abfs:// is the same vendor-spelling split.
                uri = re.sub("^s3a://", "s3://", p)
                uri = re.sub("^abfss://", "abfs://", uri)
                filesystem, rel = pafs.FileSystem.from_uri(
                    uri if re.match(_SCHEME_RE, uri) else os.path.abspath(uri)
                )
                h = hashlib.md5()
                with filesystem.open_input_stream(rel) as f:
                    while True:
                        chunk = f.read(8 << 20)
                        if not chunk:
                            break
                        h.update(chunk)
                names.append(re.sub(_SCHEME_RE, "/", p))
                hashes.append(h.hexdigest())
            yield pd.DataFrame({"filename": names, "file_hash": hashes})

    n = max(1, len(expanded))
    return (
        spark.createDataFrame([(p,) for p in expanded], "path string")
        .repartition(min(n, spark.sparkContext.defaultParallelism))
        .mapInPandas(kernel, schema)
    )


class FileLedger:
    """Parquet-backed processed-files ledger with hash-aware skip.

    Versioned layout: immutable ``v_*`` dirs under ``<path>_versions`` with
    an atomically-renamed ``_current`` pointer. ``record`` keeps the
    PREVIOUS version on disk for one generation (outstanding lazy frames
    from ``load()`` stay readable across one upsert — review r5: the old
    immediate rmtree invalidated them mid-plan) and serializes concurrent
    writers with an O_EXCL lock (two unserialized upserts both built on the
    same base and the loser's rows vanished)."""

    def __init__(self, spark: SparkSession, ledger_path: str):
        from ..sources.os_snapshot import local_fs_path

        self.spark = spark
        # Closed-world path gate (review r7): the ledger mixes os-level
        # pointer/lock/mkdir ops with Spark-resolved URI writes — on an
        # 's3a://...' warehouse the os side silently created a
        # cwd-relative 's3a:' junk tree while Spark wrote to real S3,
        # splitting the ledger's state (hash-skip defeated / torn-state
        # crash). Local paths and file:/// only; object stores need a
        # conditional-PUT ledger over sources/objectstore.
        self.path = local_fs_path(ledger_path)

    def _versions_dir(self) -> str:
        return self.path + "_versions"

    def _pointer(self) -> str:
        return os.path.join(self._versions_dir(), "_current")

    def _current_dir(self) -> str | None:
        """Pointed-at version dir, or None for a never-written ledger.
        ONLY a missing pointer means empty: a pointer that cannot be read
        (EACCES/EIO) or that names a missing dir is a torn/transient state
        and RAISES — resolving it to an empty ledger would let the next
        record() publish a history containing only the newest batch
        (review r5, the silent-history-loss class)."""
        try:
            with open(self._pointer()) as f:
                name = f.read().strip()
        except FileNotFoundError:
            return None
        d = os.path.join(self._versions_dir(), name)
        if not os.path.isdir(d):
            raise OSError(
                f"ledger pointer {self._pointer()} names missing version"
                f" {name!r} — torn state; restore the version dir or delete"
                f" the pointer to reset the ledger explicitly"
            )
        return d

    def load(self) -> DataFrame:
        """Resolve via the atomic pointer; a ledger that has never been
        written is empty. Read failures of a POINTED-AT version RAISE —
        a blanket except would return empty on any torn/transient state,
        silently discarding history and (inside record) persisting a
        ledger containing only the newest rows (reviews r4/r5)."""
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
        """Upsert (filename, file_hash, record_count) rows, latest wins.

        Publishes a fresh immutable version dir and atomically renames the
        pointer over ``_current`` — a crash mid-write leaves the old
        version referenced, never a torn table (review r4). The merged
        plan writes DIRECTLY to the new dir (review r5: the old
        collect-then-createDataFrame round trip was a leftover from the
        in-place overwrite era — immutable version dirs never read the
        path being written). Concurrent writers serialize on a lock file;
        versions older than {current, previous} are swept after publish.
        """
        if not processed:
            return
        import tempfile
        import uuid

        now = datetime.now(timezone.utc).replace(tzinfo=None)
        rows = [(f, h, now, n) for f, h, n in processed]
        update = self.spark.createDataFrame(rows, LEDGER_SCHEMA)

        os.makedirs(self._versions_dir(), exist_ok=True)
        # Shared fs_mutex (advice r5): the critical section includes a
        # Spark merge+write whose duration is unbounded on a busy cluster,
        # so the holder must HEARTBEAT the lock mtime — the old bare
        # stale-unlink assumed ledger writes complete in milliseconds and
        # let a second writer steal the lock mid-write, reintroducing the
        # lost-update race the lock exists to prevent.
        from ..sources.fslock import fs_mutex

        lock = os.path.join(self._versions_dir(), "_lock")
        with fs_mutex(lock):
            merged = (
                self.load()
                .join(update.select("filename"), on="filename", how="left_anti")
                .unionByName(update)
            )
            vdir_name = f"v_{uuid.uuid4().hex}"
            vdir = os.path.join(self._versions_dir(), vdir_name)
            merged.coalesce(1).write.mode("errorifexists").parquet(vdir)
            prev = self._current_dir()
            fd, tmp = tempfile.mkstemp(dir=self._versions_dir(), prefix="_ptr_")
            with os.fdopen(fd, "w") as f:
                f.write(vdir_name)
            os.replace(tmp, self._pointer())  # atomic publish
            # grace sweep: keep {current, previous}; older versions are
            # unreachable by any frame loaded after the prior publish
            keep = {vdir_name, os.path.basename(prev) if prev else vdir_name}
            import shutil

            for name in os.listdir(self._versions_dir()):
                if name.startswith("v_") and name not in keep:
                    shutil.rmtree(
                        os.path.join(self._versions_dir(), name),
                        ignore_errors=True,
                    )
