"""Versioned snapshot table: atomic commits + time travel on plain parquet.

The reference's sinks (S7 append, S8 full-refresh — reference:
pipeline/assets/ingest.py:248-257, aggregates.py:31+) rely on DuckDB's
transactional storage; Spark's ``mode("overwrite")`` on plain files is NOT
atomic — a reader that lists the directory mid-overwrite sees a torn table,
and a crashed writer leaves one. This sink restores the transactional edge
without requiring a table format:

- every commit writes a fresh immutable ``v=N`` directory, then publishes
  it by atomically renaming a manifest tempfile over ``_latest`` (POSIX
  rename; on object stores, swap for a conditional PUT) — readers always
  resolve a fully-written snapshot;
- old versions stay readable => time travel (``read(version=k)``) and
  snapshot diffing (operators/cdc.diff_snapshots) come for free;
- a crashed commit leaves an unreferenced ``v=N`` directory, never a
  half-published table; ``vacuum(keep)`` prunes unreferenced/old versions.

At 100 TB the commit cost is the data write itself — the publish step is
one metadata rename regardless of table size, and readers pay zero
coordination (one small-file read to resolve the version).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Plain-parquet table with atomically-published, immutable versions."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.path, "_latest")

    def latest_version(self) -> int | None:
        try:
            with open(self._manifest) as f:
                return int(json.load(f)["version"])
        except (OSError, ValueError, KeyError):
            return None

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.path):
            if name.startswith("v=") and name[2:].isdigit():
                out.append(int(name[2:]))
        return sorted(out)

    def _vdir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    def commit(self, df: DataFrame) -> int:
        """Write ``df`` as the next version and publish it atomically.
        Returns the new version number."""
        current = self.latest_version()
        version = 0 if current is None else current + 1
        df.write.mode("errorifexists").parquet(self._vdir(version))
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="_manifest_")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._manifest)  # the atomic publish
        return version

    def read(self, version: int | None = None) -> DataFrame:
        """Latest snapshot, or time travel to an explicit ``version``."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        return self.spark.read.parquet(self._vdir(v))

    def vacuum(self, keep: int = 1) -> list[int]:
        """Delete all but the newest ``keep`` PUBLISHED versions (and any
        unpublished orphans newer than the manifest — crash leftovers).
        Returns the versions removed."""
        import shutil

        latest = self.latest_version()
        if latest is None:
            return []
        removed = []
        for v in self.versions():
            published = v <= latest
            keep_this = published and v > latest - keep
            if not keep_this:
                shutil.rmtree(self._vdir(v))
                removed.append(v)
        return removed
