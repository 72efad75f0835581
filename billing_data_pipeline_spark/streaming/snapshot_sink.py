"""Exactly-once streaming appends into a SnapshotTable.

Structured Streaming's file sink is append-only with its own log; arbitrary
sinks go through ``foreachBatch``, whose contract is AT-LEAST-ONCE: after a
crash between batch completion and checkpoint advance, the same epoch is
replayed. The reference met the equivalent problem with run-key dedup and
the ledger (reference: pipeline/pipeline.py:83,157, ST4); here the
SnapshotTable's commit log carries the epoch id, so a replayed batch
resolves to the already-committed version and appends nothing — epoch-keyed
idempotence turns at-least-once delivery into an exactly-once TABLE.

Each micro-batch becomes one append commit => every batch boundary is also
a time-travel point: ``table.read(version=k)`` is the table as of batch k,
and ``operators/cdc.diff_snapshots`` between consecutive versions recovers
exactly that batch's rows — a free CDC log for downstream incremental
consumers (operators/cdc.maintain_rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.versioned_sink import SnapshotTable


def stream_to_snapshots(
    sdf: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a stream writing each micro-batch as an epoch-keyed append
    commit. Returns the StreamingQuery."""

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        table.commit(batch_df, mode="append", epoch=int(epoch_id))

    writer = (
        sdf.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
