from .aggregates import grouped_profile, success_rate, top_k
from .ingest import dedup_append, dedup_within_batch

__all__ = [
    "grouped_profile",
    "success_rate",
    "top_k",
    "dedup_append",
    "dedup_within_batch",
]
