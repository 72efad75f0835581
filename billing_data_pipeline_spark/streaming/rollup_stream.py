"""Streaming materialized rollup: incremental aggregate maintenance over a
file-source stream (SURVEY.md §2.9 + §4 OPT5 scale path).

The reference recomputes its aggregate tables from ALL raw data on every
sensor tick (O(history) per run). Here each micro-batch folds into the
rollup in O(batch + groups): the batch becomes a mergeable partial
aggregate (decimal sums + HLL sketches, operators/incremental.py) that is
merged with the stored partial state and overwritten atomically. The stored
table IS partial state — `finalize_rollup` renders it to presentation
columns on read.

Exactly-once: foreachBatch may replay a batch after failure, so the merge
must be idempotent per batch id — the rollup write records the last merged
batch id and skips replays (the transactional-sink pattern for
non-transactional storage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    ):
        self.spark = spark
        self.path = path
        self.group_cols = group_cols
        self.measure = measure
        self.distinct_cols = distinct_cols or {}

    def _load_state(self) -> tuple[DataFrame | None, int]:
        try:
            state = self.spark.read.parquet(self.path)
            last = state.agg(F.max("_last_batch_id")).first()[0]
            return state.drop("_last_batch_id"), (last if last is not None else -1)
        except Exception:
            return None, -1

    def merge_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch sink: fold one micro-batch into the rollup."""
        state, last_id = self._load_state()
        if batch_id <= last_id:
            return  # replayed batch after failure: already merged, skip
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
        out = merged.withColumn("_last_batch_id", F.lit(batch_id))
        # Atomic swap: write to a staging dir, then overwrite the live one
        # (same recompute-and-overwrite contract as the batch aggregates).
        staging = self.path + "._staging"
        out.write.mode("overwrite").parquet(staging)
        self.spark.read.parquet(staging).write.mode("overwrite").parquet(self.path)

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
