"""[EXT] Event-time windowed queries over the events table (SURVEY.md §2.9).

Registered as batch-mode equivalents (window/session_window work identically
in batch aggregations); the true streaming execution paths live in
``billing_data_pipeline_spark.streaming`` and are exercised by tests.
"""

from __future__ import annotations
