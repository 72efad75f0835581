"""Mutation-aware streaming CSV source (SURVEY.md §2.9 ST2 — the last
reference behavior with no Spark analogue, VERDICT r5 "missing" #2).

The reference's local-file sensor re-triggers a run when an ALREADY-SEEN
file's mtime advances (reference: pipeline/pipeline.py:120-146 — it keeps
a ``path:mtime`` cursor string and diffs against a fresh listing, with a
1-second buffer). Spark's built-in file source tracks names only: a file
rewritten in place is silently never re-read, and until now this repo
covered modification detection in BATCH mode only (the content-hash
ledger, ``operators/ledger.py``), documenting the streaming gap in
LIMITATIONS.md.

This Python DataSource (Spark 4 API) closes that gap: the stream offset
IS the sensor cursor — a ``{path: "mtime:size"}`` fingerprint snapshot —
checkpointed by Structured Streaming like any other offset, so restart
resumes the diff exactly where the sensor left off. Each micro-batch
emits the rows of every file that is NEW or whose fingerprint CHANGED
since the previous offset, with the reference's 1-second mtime buffer
honored via ``mtimebuffersecs``.

Semantics and contracts:

- **Modification = whole-file re-emission.** The reference re-runs its
  ingest on a modified file (dedup downstream drops already-seen rows);
  same model here — pair with the anti-join dedup sink
  (``operators/ingest.dedup_append``) for effectively-once rows.
- **Replay reads CURRENT content.** ``readBetweenOffsets`` re-reads the
  file as it exists at replay time (any file-based source has the same
  property unless it snapshots bytes into the checkpoint). A file that
  mutates between original read and replay yields the newer content —
  at-least-once on file VERSIONS, never silent loss.
- **Offset size is O(files under the path)** — the same state the
  reference packed into its cursor string. Right for partition-per-day
  lake layouts (the reference's own shape); for millions of files use
  the name-tracking native source + the batch hash ledger instead, and
  the option ``maxfilesinoffset`` (default 100_000) fails fast rather
  than silently building a multi-megabyte checkpoint row.
- **Driver-side reads** (SimpleDataSourceStreamReader contract): each
  micro-batch's rows are materialized on the driver, bounded by
  ``filespertrigger``. The executor-parallel path for bulk history is
  the native CSV reader; this source is the low-rate polling sensor.

Usage::

    spark.dataSource.register(MutationCsvDataSource)
    df = (spark.readStream.format("mutation_csv")
          .schema("ts timestamp, user_id string, amount double, _file string")
          .option("path", "/lake/year=2025/*/*/billing.csv")
          .option("header", "true")
          .load())
    # trailing `_file string` is REQUIRED and source-filled (originating
    # path — the ledger key for downstream dedup)
"""

from __future__ import annotations

import csv
import glob as _glob
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from .http_csv_source import _convert


def _list_files(pattern: str) -> list[str]:
    """Expand a path/glob to absolute file paths, sorted for determinism.
    A directory means every regular file under it (recursive)."""
    out: list[str] = []
    for p in sorted(_glob.glob(pattern)) or (
        [pattern] if os.path.exists(pattern) else []
    ):
        if os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                dirs[:] = sorted(d for d in dirs if not d.startswith((".", "_")))
                out.extend(
                    os.path.join(root, f)
                    for f in sorted(files)
                    if not f.startswith((".", "_"))
                )
        elif os.path.isfile(p):
            out.append(p)
    return [os.path.abspath(p) for p in out]


def _fingerprint(path: str) -> str | None:
    """``"mtime:size"`` — the reference sensor's change signal (mtime)
    hardened with size (a same-mtime rewrite still differs in practice;
    both stats come from the one os.stat call). None if the file vanished
    between listing and stat."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    return f"{st.st_mtime:.6f}:{st.st_size}"


def _read_csv_rows(path: str, schema: StructType, header: bool, permissive: bool):
    """Parse one CSV file into typed row tuples + trailing filename column
    (PERMISSIVE: malformed cells null out — OPT7 containment, matching
    csv_source semantics)."""
    fields = schema.fields[:-1]  # last field is the injected _file column
    rows = []
    try:
        fh = open(path, newline="")
    except OSError:
        return rows  # vanished mid-batch: nothing to emit, next diff re-checks
    with fh:
        reader = csv.reader(fh)
        first = True
        for rec in reader:
            if first and header:
                first = False
                continue
            first = False
            if not rec:
                continue
            if len(rec) != len(fields):
                if not permissive:
                    # failfast refuses malformed shapes outright, matching
                    # HttpCsvReader's contract (review r6: padding here
                    # made failfast apply only to type errors)
                    raise ValueError(
                        f"row has {len(rec)} fields, schema has "
                        f"{len(fields)}: {rec!r} in {path}"
                    )
                rec = list(rec[: len(fields)]) + [None] * (len(fields) - len(rec))
            out = []
            for v, f in zip(rec, fields):
                try:
                    out.append(_convert(v, f.dataType))
                except (ValueError, TypeError):
                    if not permissive:
                        raise
                    out.append(None)
            out.append(path)
            rows.append(tuple(out))
    return rows


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class MutationCsvBatchReader(DataSourceReader):
    """Batch form: every currently-listed file, one file per partition
    (executor-parallel) — the full-refresh twin of the stream below."""

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.pattern = options.get("path") or ""
        self.header = (options.get("header") or "true").lower() == "true"
        self.permissive = (options.get("permissive") or "true").lower() == "true"

    def partitions(self):
        return [_FilePartition(p) for p in _list_files(self.pattern)] or [
            _FilePartition("")
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:
            return iter(())
        return iter(
            _read_csv_rows(partition.path, self.schema, self.header, self.permissive)
        )


class MutationCsvStreamReader(SimpleDataSourceStreamReader):
    """The mtime-diff sensor as a checkpointable stream (module docstring)."""

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.pattern = options.get("path") or ""
        self.header = (options.get("header") or "true").lower() == "true"
        self.permissive = (options.get("permissive") or "true").lower() == "true"
        self.per_trigger = int(options.get("filespertrigger") or 16)
        self.mtime_buffer = float(options.get("mtimebuffersecs") or 0.0)
        self.max_offset_files = int(options.get("maxfilesinoffset") or 100_000)

    def initialOffset(self) -> dict:
        # empty snapshot: the first batch reads EVERYTHING as "new" —
        # the reference sensor's first run does the same
        return {"files": {}}

    def _changed(self, seen: dict) -> tuple[list[tuple[str, str]], set[str]]:
        """(changed, live): ``changed`` is (path, fingerprint) for every
        new-or-modified file vs ``seen`` (honoring the reference's mtime
        buffer for modifications); ``live`` is the set of paths currently
        present on disk, so ``read`` can prune vanished files from the
        checkpointed snapshot instead of carrying them forever."""
        out = []
        listed = _list_files(self.pattern)
        if len(listed) > self.max_offset_files:
            raise RuntimeError(
                f"mutation_csv: {len(listed)} files under {self.pattern!r} "
                f"exceeds maxFilesInOffset={self.max_offset_files}; this "
                "sensor checkpoints a per-file fingerprint — use the native "
                "file source + batch hash ledger for bulk layouts"
            )
        for p in listed:
            fp = _fingerprint(p)
            if fp is None:
                continue
            prev = seen.get(p)
            if prev is None:
                out.append((p, fp))
            elif prev != fp:
                if self.mtime_buffer > 0:
                    new_mtime = float(fp.split(":", 1)[0])
                    same_size = prev.split(":", 1)[1] == fp.split(":", 1)[1]
                    # reference buffer (pipeline.py:139-141), recast as a
                    # DEFERRAL rather than the reference's permanent skip:
                    # a same-size mtime advance is held back only while
                    # the change is RECENT (possibly still being written /
                    # clock jitter); once the file has been quiet past the
                    # buffer, the change is accepted on the next poll. The
                    # reference's own form (old_mtime + buffer) suppressed
                    # a genuine same-length edit FOREVER — the unchanged
                    # fingerprint re-failed the same comparison every
                    # trigger (review r6). A size change always counts.
                    import time as _time

                    if same_size and _time.time() - new_mtime < self.mtime_buffer:
                        continue
                out.append((p, fp))
        return out, set(listed)

    def read(self, start: dict):
        seen = dict(start.get("files", {}))
        changed, live = self._changed(seen)
        batch = changed[: self.per_trigger]
        # Prune vanished paths from the snapshot (advice r6): their rows
        # were already emitted, so dropping them is correctness-neutral,
        # keeps the offset sized to the LIVE directory instead of its
        # whole history, and makes a delete-then-restore (even with an
        # identical mtime:size — `cp -p` from backup) re-emit as "new"
        # instead of being silently swallowed by a stale fingerprint.
        #
        # Guarded prune (review r7): a path leaves the snapshot only when
        # it is BOTH absent from the listing AND absent on an individual
        # stat, AND was already missing on the previous poll. glob()
        # swallows I/O errors — a one-trigger network-mount blip returns
        # an empty listing, and an unguarded prune would then drop every
        # fingerprint and re-emit the whole directory as "new" when the
        # mount returns. The two-poll deferral rides driver memory, not
        # the checkpoint (worst case after a restart: one extra poll of
        # retention, never a duplicate emission).
        vanished = {
            p for p in seen
            if p not in live and not os.path.exists(p)
        }
        drop = vanished & getattr(self, "_gone_pending", set())
        self._gone_pending = vanished - drop
        end_files = {p: fp for p, fp in seen.items() if p not in drop}
        end_files.update(dict(batch))
        end = {"files": end_files}
        return self._rows_for(batch), end

    def readBetweenOffsets(self, start: dict, end: dict):
        sf = start.get("files", {})
        ef = end.get("files", {})
        batch = [(p, fp) for p, fp in ef.items() if sf.get(p) != fp]
        return self._rows_for(batch)

    def _rows_for(self, batch: list[tuple[str, str]]):
        # materialized list-iterator, not a generator: the simple-reader
        # wrapper prefetches on the driver and pickles the iterator for
        # replay (list_iterator pickles, generators don't)
        rows: list[tuple] = []
        for path, _fp in batch:
            rows.extend(
                _read_csv_rows(path, self.schema, self.header, self.permissive)
            )
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up; the offset is the state


class MutationCsvDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mutation_csv"

    def schema(self):
        raise NotImplementedError(
            "mutation_csv requires an explicit .schema(...): the CSV data "
            "columns followed by a trailing `_file string` column (the "
            "source fills it with the originating path — the ledger key "
            "for downstream dedup)"
        )

    @staticmethod
    def _validate(schema: StructType) -> StructType:
        if (
            not schema.fields
            or schema.fields[-1].name != "_file"
            or schema.fields[-1].dataType.typeName() != "string"
        ):
            raise ValueError(
                "mutation_csv schema must end with `_file string` (the "
                "source-filled originating-path column); got: "
                + schema.simpleString()
            )
        return schema

    def reader(self, schema: StructType) -> MutationCsvBatchReader:
        return MutationCsvBatchReader(self._validate(schema), self.options)

    def simpleStreamReader(self, schema: StructType) -> MutationCsvStreamReader:
        return MutationCsvStreamReader(self._validate(schema), self.options)
