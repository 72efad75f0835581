"""[EXT] Relational surface beyond the reference: joins, windows, set ops,
JSON, dates, pivot/rollup (SURVEY.md §2.5, §2.7, §2.8 EXT notes)."""

from __future__ import annotations
