"""Streaming idempotent ingestion (SURVEY.md §2.9 ST1/ST2/ST4, §4 OPT2-3).

Replaces the reference's sensor+cursor loop (reference: pipeline/
pipeline.py:41-161) with a checkpointed file-source stream whose sink is the
same idempotent anti-join append used in batch (operators/ingest.py):

- the checkpoint's file index subsumes the name-based processed-files skip
  (new files only, exactly-once per file even across restarts);
- the per-batch ``dedup_append`` keeps re-delivered ROWS out (at-least-once
  delivery, replayed batches after a crash, overlapping backfills);
- ``Trigger.AvailableNow`` gives batch-catchup runs (the backfill entry
  point) with the same code path as continuous ``ProcessingTime`` triggers.

Divergence note (documented, SURVEY.md §7 Phase 4): Spark's file source
never re-reads a file modified in place; the reference's mtime sensor did.
Content-hash redetection stays a batch-mode concern via operators/ledger.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.ingest import append_new_rows
from ..sources.csv_source import RAW_BILLING_KEYS, RAW_BILLING_SCHEMA


def stream_ingest_csv(
    spark: SparkSession,
    source_glob: str,
    table_path: str,
    checkpoint_dir: str,
    schema: T.StructType = RAW_BILLING_SCHEMA,
    keys: tuple[str, ...] = RAW_BILLING_KEYS,
    available_now: bool = True,
    processing_interval: str = "5 minutes",
):
    """Stream CSV files into an idempotent parquet table.

    Returns the started StreamingQuery; callers ``awaitTermination()`` it
    (AvailableNow drains what exists and stops — the backfill/catch-up mode)
    or leave it running on a processing-time trigger (the sensor mode,
    interval mirroring the reference's 300 s poll floor).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(source_glob)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch may replay a batch after failure; dedup_append makes
        # the replay a no-op => effectively exactly-once into the table.
        append_new_rows(batch, table_path, list(keys))

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()
