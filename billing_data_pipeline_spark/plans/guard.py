"""Plan-shape guards: mechanical checks that a query's logical plan obeys
the framework's scale contract.

The one rule enforced today (r8, VERDICT item 1): a FORCED broadcast
(``F.broadcast`` / broadcast hint) must never build over an input whose
size grows with the data (SF-proportional). At bench scale AQE picks a
broadcast join for those sides on its own; at 100 TB a forced hint
bypasses the size check and OOMs the driver/executors. The hint is only
legitimate when the build side is *structurally bounded*:

- it reads only bounded dimension tables (``nation``: 25 rows at any SF,
  ``region``: 5 rows), or literal/local data, or
- a bounding operator sits between the hint and every unbounded leaf —
  a scalar aggregate (``groupBy()`` with no keys -> exactly one row) or a
  ``LIMIT`` (GlobalLimit caps output rows at a plan-time constant; a bare
  LocalLimit does NOT count — it caps rows per partition only).

A grouped aggregate is NOT bounding (its row count is the key
cardinality, which grows with SF), so e.g. ``F.broadcast(lineitem
.groupBy(k).agg(...))`` is flagged even though the group count may be
small in practice. Queries with a semantically-but-not-structurally
bounded hint must register an explicit exception with a justification
(see tests/test_broadcast_guard.py::ALLOWED_UNBOUNDED_HINTS).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: Dimension tables bounded by the schema, not the scale factor.
BOUNDED_TABLES = frozenset({"nation", "region"})

#: Leaf plan nodes that carry no scan of on-disk data.
_LITERAL_LEAVES = frozenset(
    {"LocalRelation", "OneRowRelation", "Range", "LocalTableScan"}
)

_TABLE_RE = re.compile(r"([A-Za-z0-9_]+)\.(?:parquet|csv|json|orc)")


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _iter_nodes(node):
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(_children(n))


def _is_broadcast_hint(node) -> bool:
    if node.getClass().getSimpleName() != "ResolvedHint":
        return False
    return "broadcast" in node.hints().toString().lower()


def _is_bounding(node) -> bool:
    """True when every row set below ``node`` is capped at a plan-time
    constant regardless of input size."""
    cls = node.getClass().getSimpleName()
    if cls == "Aggregate":
        # Scalar aggregate: no grouping keys -> exactly one output row.
        return node.groupingExpressions().isEmpty()
    if cls == "GlobalLimit":
        # LIMIT n: Spark plans `.limit(n)` as GlobalLimit over LocalLimit;
        # the GlobalLimit caps TOTAL output rows at a plan-time constant.
        # A bare LocalLimit is NOT bounding (r8 VERDICT item 4): it caps
        # rows *per partition*, so total = n_partitions x n, which grows
        # with the data. Today's API always pairs them, but a future
        # limit-pushdown shape could surface a LocalLimit alone — only
        # the GlobalLimit counts (any LocalLimit beneath one is never
        # reached because traversal stops at the GlobalLimit).
        return True
    return False


def _leaf_source(n) -> str:
    """Best-effort source identifier for a leaf scan: the file-relation
    root paths when present (LogicalRelation/HadoopFsRelation), else the
    node's own string form (DataSourceV2, catalog tables, streams)."""
    try:
        rp = n.relation().location().rootPaths()
        return " ".join(str(rp.apply(i)) for i in range(rp.size()))
    except Exception:
        return n.toString()


def _unbounded_leaves(hint_child) -> list[str]:
    """Leaf scans under ``hint_child`` not separated from it by a
    bounding operator and not themselves bounded tables."""
    out: list[str] = []
    stack = [hint_child]
    while stack:
        n = stack.pop()
        if _is_bounding(n):
            continue
        kids = _children(n)
        if not kids:
            cls = n.getClass().getSimpleName()
            if cls in _LITERAL_LEAVES:
                continue
            text = _leaf_source(n)
            m = _TABLE_RE.search(text)
            table = m.group(1) if m else f"<{cls}>"
            if table not in BOUNDED_TABLES:
                out.append(table)
            continue
        stack.extend(kids)
    return out


def forced_broadcast_violations(df: DataFrame) -> list[str]:
    """Return one message per broadcast hint in ``df``'s analyzed logical
    plan whose build side is not structurally bounded. Empty list = the
    plan honors the scale contract."""
    analyzed = df._jdf.queryExecution().analyzed()
    violations: list[str] = []
    for node in _iter_nodes(analyzed):
        if not _is_broadcast_hint(node):
            continue
        for child in _children(node):
            leaves = _unbounded_leaves(child)
            if leaves:
                violations.append(
                    "broadcast hint over unbounded input(s): "
                    + ", ".join(sorted(set(leaves)))
                )
    return violations
