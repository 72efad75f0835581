"""Plan-visible generated-name minting (memory sinks, temp views).

Several operators stamp a per-call uuid slice on a memory-sink or
temp-view name so concurrent calls in one session can't collide. Those
names leak into the analyzed plan text, so tools/plan_fingerprints.py
must normalize them away — and an all-digit uuid slice is a
(10/16)^width event per call that a letters-required hex rule misses
(the r9 fingerprint flake). The normalizer therefore anchors on the
exact prefixes; this module is the single source of truth for them
(ADVICE r10: the hand-maintained regex whitelist in plan_fingerprints
would silently drift from the code when a new prefix was added,
reviving the flake for that operator).

Adding a new uid-suffixed name = add the prefix here and mint through
``uid_name`` — minting an unregistered prefix raises immediately, so
the drift can't happen silently.
"""

from __future__ import annotations

import uuid

#: every prefix the codebase stamps on a plan-visible generated name.
PLAN_UID_PREFIXES: tuple[str, ...] = (
    "catchup",
    "cur",
    "docs_for_runs",
    "enrich",
    "ohlc",
    "sdedup",
    "sess_catchup",
    "slide_catchup",
    "ssjoin",
    "ssloj",
    "stateful",
)


def uid_name(prefix: str, width: int = 8) -> str:
    """``<prefix>_<width-hex uuid slice>`` for a registered prefix."""
    if prefix not in PLAN_UID_PREFIXES:
        raise ValueError(
            f"uid-name prefix {prefix!r} is not registered in "
            "billing_data_pipeline_spark._names.PLAN_UID_PREFIXES — add it "
            "there so tools/plan_fingerprints.py normalizes it"
        )
    if not 8 <= width <= 16:
        raise ValueError(
            f"uid width {width} outside the normalizer's 8-16 hex range"
        )
    return f"{prefix}_{uuid.uuid4().hex[:width]}"


def sql_ident(name: str) -> str:
    """Backtick-quoted SQL identifier for selectExpr/expr-string builders.

    The r11 construction-overhead pass assembles hot projection lists as
    SQL strings (one py4j round-trip per select instead of 3-5 per
    Column op — driver-side construction is inside the bench's timed
    region and the Column forms cost the expression-heavy operators
    0.1-0.35 s per invocation). Operators take arbitrary caller column
    names, so every interpolated identifier must be quoted."""
    return "`" + name.replace("`", "``") + "`"
