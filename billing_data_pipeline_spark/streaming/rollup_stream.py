"""Streaming materialized rollup: incremental aggregate maintenance over a
file-source stream (SURVEY.md §2.9 + §4 OPT5 scale path).

The reference recomputes its aggregate tables from ALL raw data on every
sensor tick (O(history) per run). Here each micro-batch folds into the
rollup in O(batch + groups): the batch becomes a mergeable partial
aggregate (decimal sums + HLL sketches, operators/incremental.py) that is
merged with the stored partial state. The stored table IS partial state —
`finalize_rollup` renders it to presentation columns on read.

Crash safety (the whole point of the layout): state versions are immutable
``v={batch_id}`` directories published by an atomically-renamed pointer
file — the same publish discipline as ``sources/versioned_sink``. A crash
anywhere leaves either the old pointer (old state intact, batch replays
into a fresh dir) or the new pointer (batch complete, replay skipped);
there is NO window where the live state is torn. The previous
overwrite-in-place design could lose the entire rollup: a crash mid-
overwrite left a torn directory that read back as "no state", and the
replayed batch became the whole history (caught in round-3 review).

Exactly-once: foreachBatch may replay a batch after failure; the pointer
records the last merged batch id and replays are skipped. An orphan
``v=N`` dir from a crash-before-publish is overwritten on replay — the
pointer, not the directory listing, is the truth.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental import finalize_profile, merge_partials, partial_profile


class StreamingRollup:
    """One parquet-backed incremental rollup table."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_cols: list[str],
        measure: str,
        distinct_cols: dict[str, str] | None = None,
        keep_versions: int = 2,
    ):
        self.spark = spark
        self.path = path
        self.group_cols = group_cols
        self.measure = measure
        self.distinct_cols = distinct_cols or {}
        self.keep_versions = max(1, keep_versions)
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_latest")

    def _last_batch_id(self) -> int:
        # Only a MISSING pointer means "no state yet". A transient read
        # failure (EIO/EACCES) or corrupt pointer must RAISE, never read
        # as -1: returning -1 disarms the checkpoint-reset guard below
        # and the next merged batch would be published as the entire
        # history — silent total state loss (review r7; the same
        # bare-except class versioned_sink._load was hardened against
        # in r5). The pointer is written via tempfile + os.replace, so a
        # torn/corrupt pointer is never a legal state.
        try:
            with open(self._pointer) as f:
                raw = f.read()
        except FileNotFoundError:
            return -1
        try:
            return json.loads(raw)["v"]
        except (ValueError, KeyError) as exc:
            raise OSError(
                f"corrupt rollup pointer {self._pointer!r}: {raw!r} — "
                "refusing to treat existing state as empty (a replay "
                "would republish one batch as the whole rollup)"
            ) from exc

    def _vdir(self, batch_id: int) -> str:
        return os.path.join(self.path, f"v={batch_id}")

    def _load_state(self) -> tuple[DataFrame | None, int]:
        last = self._last_batch_id()
        if last < 0:
            return None, -1
        return self.spark.read.parquet(self._vdir(last)), last

    def merge_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch sink: fold one micro-batch into the rollup."""
        state, last_id = self._load_state()
        if batch_id == last_id:
            return  # replayed batch after failure: already merged, skip
        if batch_id < last_id:
            # A restart from an intact checkpoint replays only the last
            # uncommitted batch (== last_id) or continues at last_id + 1.
            # A LOWER id means the checkpoint was reset/relocated while
            # the rollup state survived — silently skipping every batch
            # here would freeze the rollup forever while appearing to run
            # (review r5); merging would double-count. Fail loudly.
            raise RuntimeError(
                f"rollup at {self.path} already merged through batch"
                f" {last_id} but the attached stream delivered batch"
                f" {batch_id}: the stream checkpoint was reset. Point the"
                f" rollup at a fresh path (or delete it) to reprocess."
            )
        partial = partial_profile(
            batch, self.group_cols, self.measure, self.distinct_cols
        )
        merged = (
            merge_partials(
                state.unionByName(partial), self.group_cols, self.distinct_cols
            )
            if state is not None
            else partial
        )
        vdir = self._vdir(batch_id)
        if os.path.exists(vdir):
            shutil.rmtree(vdir)  # unpublished orphan from a crashed attempt
        merged.write.mode("errorifexists").parquet(vdir)
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="_latest_")
        with os.fdopen(fd, "w") as f:
            json.dump({"v": batch_id}, f)
        os.replace(tmp, self._pointer)  # the atomic publish
        # prune versions no reader can need: keep the newest
        # ``keep_versions`` published dirs (review r5: the old pair-wise
        # {batch_id, last_id} keep silently ignored keep_versions > 2,
        # deleting exactly the grace copies a slow reader paid for)
        published = sorted(
            int(name[2:])
            for name in os.listdir(self.path)
            if name.startswith("v=")
            and name[2:].lstrip("-").isdigit()
            and int(name[2:]) <= batch_id
        )
        keep = set(published[-self.keep_versions:])
        for v in published:
            if v not in keep:
                shutil.rmtree(os.path.join(self.path, f"v={v}"), ignore_errors=True)

    def attach(self, stream: DataFrame, checkpoint_dir: str, available_now: bool = True):
        """Wire the rollup as a foreachBatch sink on a streaming DataFrame."""
        writer = stream.writeStream.foreachBatch(self.merge_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def read_finalized(self) -> DataFrame:
        state, _ = self._load_state()
        if state is None:
            raise FileNotFoundError(f"no rollup state at {self.path}")
        return finalize_profile(state, self.distinct_cols)
