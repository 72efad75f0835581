"""Structured Streaming layer (SURVEY.md §2.9).

The reference does micro-batch incremental processing with polling sensors
and cursors (reference: pipeline/pipeline.py:41-161); here the same
capabilities are native Structured Streaming:

- ``ingest_stream``   — checkpointed file-source ingestion with idempotent
                        anti-join append per micro-batch (sensors ST1/ST2 +
                        run-key idempotency ST4, subsumed).
- ``event_windows``   — watermarked tumbling/sliding/session event-time
                        aggregates + dropDuplicatesWithinWatermark.
- ``stateful``        — applyInPandasWithState custom stateful operator.
"""

from .event_windows import (  # noqa: F401
    interval_join_stream,
    read_event_stream,
    run_to_memory,
    session_stats_stream,
    sliding_volume_stream,
    streaming_dedup,
    tumbling_counts_stream,
)
from .ingest_stream import stream_ingest_csv  # noqa: F401
from .rollup_stream import StreamingRollup  # noqa: F401
from .stateful import stateful_user_totals  # noqa: F401
