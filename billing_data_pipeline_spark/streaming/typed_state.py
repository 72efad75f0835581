"""Typed-state streaming via transformWithStateInPandas (Spark 4), behind
an availability probe (SURVEY.md §2.9 EXT; VERDICT r3 #9).

Twin of ``stateful.stateful_user_totals`` on Spark 4's typed arbitrary-
state API: a ``StatefulProcessor`` with a named ValueState replaces the
positional GroupState tuple. Semantics are identical — per-user lifetime
(count, total) folded across micro-batches, update-mode emission — so the
same memory-sink test asserts both.

Environment gate: transformWithStateInPandas's Python worker talks to the
state server over protobuf; this container ships no ``google.protobuf``
and has no pip (LIMITATIONS.md "APIs gated by the container environment").
``TYPED_STATE_AVAILABLE`` probes for the dependency so the operator (and
its test) light up the moment the environment gains it, without code
changes. The logic below follows the public API contract
(pyspark.sql.streaming.stateful_processor) and mirrors the
applyInPandasWithState twin line-for-line; until the gate opens it is
exercised only for import/structure.
"""

from __future__ import annotations

import importlib.util

import pandas as pd

from pyspark.sql import DataFrame

from .stateful import USER_TOTALS_SCHEMA, _STATE_SCHEMA

TYPED_STATE_AVAILABLE: bool = (
    importlib.util.find_spec("google") is not None
    and importlib.util.find_spec("google.protobuf") is not None
)


def _make_processor():
    """Build the StatefulProcessor lazily: the base class imports cleanly
    without protobuf, but constructing it at module import would couple
    this module's importability to the pyspark version."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                # Deterministic left-to-right fold, NaN-skipping — the
                # exact contract of the applyInPandasWithState twin.
                for v in pdf["value"]:
                    if pd.notna(v):
                        total += float(v)
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return UserTotalsProcessor()


def typed_stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, total) on the typed-state API. Raises a
    clear error when the environment lacks protobuf — callers should gate
    on TYPED_STATE_AVAILABLE."""
    if not TYPED_STATE_AVAILABLE:
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf, which this "
            "environment lacks — use stateful.stateful_user_totals "
            "(applyInPandasWithState) instead"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(),
        outputStructType=USER_TOTALS_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
