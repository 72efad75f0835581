"""Minimal object-store abstraction for the durability kit's commit log.

The POSIX `SnapshotTable` (versioned_sink.py) publishes with an atomic
rename and serializes mutators with an O_EXCL lock file — primitives an
object store does not have (S3 has no rename at all; "rename" is
copy+delete and is neither atomic nor cheap). What every modern object
store DOES have is **conditional PUT** — create-if-absent compare-and-swap
on a single key (S3 `If-None-Match: *` since 2024, GCS
`x-goog-if-generation-match: 0`, Azure `If-None-Match: *`) — and that one
primitive is enough for a Delta/Iceberg-style optimistic commit log
(reference behavior target: pipeline/s3_utils.py ships data to exactly such
a store). This module defines the four-operation surface the log needs and
two implementations:

- ``LocalObjectStore`` — POSIX-backed, for production use on local/NFS
  warehouses and as the store under the multi-process durability sweep
  (O_EXCL gives a true conditional PUT across processes);
- ``SimulatedObjectStore`` — the same, plus injectable object-store
  pathologies for fault-injection tests: list-after-write lag (a freshly
  PUT key is invisible to ``list`` for a while — S3 listings were
  eventually consistent for years and other stores still are), and named
  crash hooks so a test can kill a commit between any two protocol steps.

Deliberately NOT in the surface: rename (object stores don't have it — the
commit protocol never renames), append, and byte-range writes. ``get`` is
read-after-write consistent (true of S3/GCS/Azure today); only ``list``
may lag. An S3/GCS implementation is a straightforward third subclass
(put_if_absent = conditional PUT, mtime = the listing's LastModified);
it is not shipped here because this environment has no object store to
test against.
"""

from __future__ import annotations

import os
import tempfile
import threading
import time


class ObjectStore:
    """Key-value object surface: flat string keys, whole-object ops."""

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomically create ``key`` with ``data``; False if it exists.
        This is the commit log's ONLY coordination primitive."""
        raise NotImplementedError

    def put(self, key: str, data: bytes) -> None:
        """Unconditional overwrite (heartbeat markers only — never used
        for log entries, whose immutability IS the protocol)."""
        raise NotImplementedError

    def get(self, key: str) -> bytes | None:
        """Object bytes, or None when absent. Read-after-write consistent."""
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """Keys under ``prefix`` (sorted). MAY lag recent puts — callers
        must forward-probe with ``get`` for anything freshness-critical."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Remove ``key``; absent keys are a no-op (idempotent delete)."""
        raise NotImplementedError

    def mtime(self, key: str) -> float | None:
        """Store-side last-modified epoch seconds, or None when absent.
        Every real store exposes this in listings (LastModified)."""
        raise NotImplementedError

    # --- data-plane seam -------------------------------------------------
    def data_url(self, key_prefix: str, create: bool = False) -> str:
        """URL/path Spark (or any parquet writer) writes data under for
        the given key prefix. Data objects bypass the metadata ops above —
        a 100 TB parquet write goes through the store's native bulk path
        (s3a + cloud committer on a real store, the filesystem here); the
        protocol only needs the WRITE TARGET to be a never-renamed,
        uniquely-named prefix. Pure unless ``create=True`` (the committer
        asks for any parent/bucket preparation the store needs; readers
        must never mutate the store)."""
        raise NotImplementedError


class LocalObjectStore(ObjectStore):
    """POSIX directory as an object store. put_if_absent = O_CREAT|O_EXCL
    (atomic on every local/network POSIX filesystem); put = tempfile +
    os.replace so a concurrent get never sees a torn object."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _p(self, key: str) -> str:
        if key.startswith(("/", "..")) or "/../" in key:
            raise ValueError(f"bad object key: {key!r}")
        return os.path.join(self.root, key)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        # A real conditional PUT is atomic WITH ITS CONTENT: the object is
        # either absent or fully readable, never empty-then-filled. The
        # naive O_EXCL-create-then-write emulation violates that — the
        # multi-process storm caught a concurrent get() reading ZERO bytes
        # between the create and the write (r7). Write the bytes to a
        # private temp file first, then os.link() it to the key: link
        # fails with EEXIST when the key exists (the compare-and-swap) and
        # otherwise exposes the key with its full content in one atomic
        # directory operation.
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix="_cas_")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            try:
                os.link(tmp, path)
                return True
            except FileExistsError:
                # NFS retransmit quirk (review r7): a lost LINK reply is
                # retried by the client and can report EEXIST even though
                # OUR link landed — the classic false "lost the race"
                # that O_EXCL-token protocols read back to detect. The
                # commit log's payloads embed a per-attempt uuid, so
                # byte-equality can only mean this call won.
                try:
                    with open(path, "rb") as f:
                        return f.read() == data
                except OSError:
                    return False
        finally:
            os.unlink(tmp)

    def put(self, key: str, data: bytes) -> None:
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix="_put_")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def get(self, key: str) -> bytes | None:
        try:
            with open(self._p(key), "rb") as f:
                return f.read()
        except (FileNotFoundError, IsADirectoryError):
            return None

    def list(self, prefix: str) -> list[str]:
        base = self._p(prefix)
        out: list[str] = []
        if os.path.isdir(base):
            walk_root, rel_base = base, prefix.rstrip("/")
            for dirpath, _dirs, files in os.walk(walk_root):
                rel_dir = os.path.relpath(dirpath, walk_root)
                for name in files:
                    if name.startswith(("_cas_", "_put_")):
                        continue  # in-flight CAS/put temp, not an object
                    rel = name if rel_dir == "." else f"{rel_dir}/{name}"
                    out.append(f"{rel_base}/{rel}" if rel_base else rel)
        return sorted(out)

    def delete(self, key: str) -> None:
        try:
            os.unlink(self._p(key))
        except FileNotFoundError:
            pass

    def mtime(self, key: str) -> float | None:
        try:
            return os.path.getmtime(self._p(key))
        except OSError:
            return None

    def data_url(self, key_prefix: str, create: bool = False) -> str:
        # pure by default (review r7): _resolve calls this on the READ
        # path, which must not mutate the store (read-only mounts /
        # read-only credentials on a real store); only the committer
        # passes create=True
        path = self._p(key_prefix)
        if create:
            os.makedirs(os.path.dirname(path), exist_ok=True)
        return path

    def sweep_stale_temps(self, older_than_secs: float) -> int:
        """Reclaim crash-orphaned CAS/put temp files. list() hides
        ``_cas_*``/``_put_*`` by design (in-flight, not objects), so
        vacuum's list()-driven sweep can never reach one orphaned by a
        process killed between mkstemp and its finally-unlink — an
        unbounded leak without this (review r7). Age-gated by the same
        staleness threshold as data orphans; a LIVE writer's temp is
        milliseconds old and never crosses it."""
        cutoff = time.time() - older_than_secs
        swept = 0
        for dirpath, _dirs, files in os.walk(self.root):
            for name in files:
                if not name.startswith(("_cas_", "_put_")):
                    continue
                p = os.path.join(dirpath, name)
                try:
                    if os.path.getmtime(p) <= cutoff:
                        os.unlink(p)
                        swept += 1
                except OSError:
                    pass  # already gone / concurrently swept
        return swept


class SimulatedObjectStore(LocalObjectStore):
    """LocalObjectStore plus injectable object-store pathologies.

    - ``list_lag_secs``: a key is hidden from ``list`` until it has been
      in the store this long (listing eventual consistency). ``get`` /
      ``put_if_absent`` stay strongly consistent, as on real stores.
    - ``hooks``: {name: callable} fired at protocol points
      (``before_log_put``, ``after_data_write``, ...). A hook that raises
      simulates a crash at exactly that boundary; tests use this to strand
      orphans and torn commit attempts deterministically.

    Thread-safe for the fault-injection tests (one process, many
    committer threads); the multi-PROCESS sweep uses LocalObjectStore,
    whose O_EXCL semantics are kernel-enforced across processes.
    """

    def __init__(self, root: str, list_lag_secs: float = 0.0):
        super().__init__(root)
        self.list_lag_secs = list_lag_secs
        self.hooks: dict[str, object] = {}
        self._born: dict[str, float] = {}
        self._mu = threading.Lock()

    def fire(self, name: str) -> None:
        hook = self.hooks.get(name)
        if hook is not None:
            hook()  # type: ignore[operator]

    def settle(self) -> None:
        """Make every past put visible to list() (the store 'caught up')."""
        with self._mu:
            self._born.clear()

    def put_if_absent(self, key: str, data: bytes) -> bool:
        ok = super().put_if_absent(key, data)
        if ok and self.list_lag_secs > 0:
            with self._mu:
                self._born[key] = time.monotonic()
        return ok

    def put(self, key: str, data: bytes) -> None:
        super().put(key, data)
        if self.list_lag_secs > 0:
            with self._mu:
                self._born.setdefault(key, time.monotonic())

    def list(self, prefix: str) -> list[str]:
        keys = super().list(prefix)
        if self.list_lag_secs <= 0:
            return keys
        now = time.monotonic()
        with self._mu:
            return [
                k
                for k in keys
                if now - self._born.get(k, -1e18) >= self.list_lag_secs
            ]
