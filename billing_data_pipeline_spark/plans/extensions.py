"""[EXT] LLM-data-pipeline operators (SURVEY.md §2.12): dedup, similarity
search, text analysis, multimodal columns over documents/embeddings."""

from __future__ import annotations
