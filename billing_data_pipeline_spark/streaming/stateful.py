"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 EXT, §2.10).

Built-in windowed aggregates cover the reference's whole surface; this is
the escape hatch for state machines they can't express (running per-entity
accumulators that survive across micro-batches, custom eviction, etc.).
Demonstrated: per-user lifetime totals maintained in explicit group state —
each micro-batch folds its rows into the state and emits the updated row
(update semantics), Arrow-batched per group.

Scale notes: state lives in the state store partitioned by the group key —
the same shuffle shape as a groupBy; the pandas kernel sees one group at a
time, never the whole partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_TOTALS_SCHEMA = T.StructType(
    [
        # user_id is NULLABLE (r8, NULL-key sweep): SQL GROUP BY keeps a
        # NULL group, and applyInPandasWithState happily keys state on a
        # None group key — but with the old non-null field the emit of
        # that group failed row DECODING (EXPRESSION_DECODING_FAILED) and
        # killed the whole stream: one undated-identity row was fatal
        # rather than aggregated.
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        # Deterministic left-to-right fold (math.fsum would be more accurate
        # but engines can't reproduce it; sequential sum is the contract).
        # NULL values arrive as NaN through Arrow — skip them like the
        # batch twin's F.sum skips NULLs. Documented divergence (review
        # r7): a GENUINE NaN input value is indistinguishable from an
        # Arrow-rendered NULL in a float64 pandas column, so it is also
        # skipped here, while F.sum would propagate NaN into the total
        # forever. For a running total the skip is the useful semantics
        # (one NaN event would otherwise poison the stream's total for
        # its whole lifetime); the oracle compares counts, not totals,
        # across this boundary.
        for v in pdf["value"]:
            if pd.notna(v):
                total += float(v)
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, total) over an unbounded stream; state
    persists across micro-batches in the state store."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
