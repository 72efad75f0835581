"""[EXT] Temporal-join catalog: as-of and range joins over events — the two
canonical operators Spark lacks natively, composed from built-ins
(operators/asof.py). DuckDB has native ASOF JOIN, so both are fully
oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import (
    asof_join_backward,
    asof_join_backward_cogrouped,
    range_join,
)
from ..registry import register
from ._util import t


def _dedup_clicks(ev: DataFrame) -> DataFrame:
    """Clicks deduped on (user_id, ts), keeping the max event_id row — the
    caller-side tie resolution asof_join_backward's contract requires
    (right-side timestamps must be unique per entity; struct-max == the
    oracle's arg_max over globally-unique event ids). Map-side partials
    collapse ties before the exchange."""
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("_c"))
        .select("user_id", "ts", F.col("_c.event_id").alias("event_id"),
                F.col("_c.value").alias("value"))
    )


# ONE oracle for both as-of formulations (review r7: it was two verbatim
# copies, so an r5-style fix to the tie rule in one registration would
# silently leave the other tier verifying against a stale twin).
_ASOF_ORACLE = """
WITH ev AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type
    FROM events
),
-- clicks deduped on (user, ts) keeping max event_id: as-of is only
-- well-defined with unique right timestamps, and ASOF JOIN's own tie pick
-- is engine-private (review r3)
r AS (
    -- ROW-wise pick (review r5): per-column arg_max(value, event_id)
    -- SKIPS rows whose value is NULL, so a tie (id=100, v=5.0) vs
    -- (id=200, v=NULL) returned id 200 with value 5.0 — a row that never
    -- existed — while Spark's struct-max keeps (200, NULL). QUALIFY keeps
    -- whole rows. ts IS NOT NULL (r8, NULL-ts sweep): an undated click
    -- can never be proven at-or-before anything — and it must not reach
    -- DuckDB's ASOF operator, whose NULL handling is engine-private.
    SELECT user_id, ts, event_id, value
    FROM ev WHERE event_type = 'click' AND ts IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY user_id, ts
                               ORDER BY event_id DESC) = 1
)
-- NULL-ts purchases ride OUTSIDE the ASOF operator (r8, NULL-ts sweep):
-- the predicate l.ts >= r.ts is never true for a NULL probe, but DuckDB's
-- ASOF JOIN implementation sorts the NULL probe LAST and matched it to
-- the user's LATEST click — engine-private behavior contradicting its own
-- join predicate. The contract (shared with both Spark forms): an undated
-- anchor matches nothing.
SELECT l.event_id, l.user_id,
       r.event_id AS asof_event_id,
       r.value AS asof_value
FROM (SELECT * FROM ev WHERE event_type = 'purchase' AND ts IS NOT NULL) l
ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
UNION ALL
SELECT event_id, user_id, NULL AS asof_event_id, NULL AS asof_value
FROM ev WHERE event_type = 'purchase' AND ts IS NULL
"""


@register(
    "purchase_last_click_asof",
    tags=("ext", "join", "asof"),
    bench=True,
    oracle=_ASOF_ORACLE,
)
def purchase_last_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase event picks the latest click by
    the same user at-or-before its timestamp. Spark composition = union +
    ordered window last(ignorenulls) — one shuffle, no join explosion;
    oracle = DuckDB's native ASOF LEFT JOIN."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = _dedup_clicks(ev)
    joined = asof_join_backward(
        purchases, clicks, "user_id", "ts", ["event_id", "value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_event_id"),
        F.col("asof_value"),
    )


@register(
    "purchase_last_click_asof_cogroup",
    tags=("ext", "join", "asof", "cogroup"),
    oracle=_ASOF_ORACLE,
)
def purchase_last_click_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same backward as-of join on the cogrouped-pandas path:
    cogroup().applyInPandas + pd.merge_asof per user — identical result to
    the union+window form (shared oracle), completing the pandas API
    family. One co-partitioning shuffle, per-group memory bounded by the
    entity's own rows."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = _dedup_clicks(ev)
    joined = asof_join_backward_cogrouped(
        purchases, clicks, "user_id", "ts", ["event_id", "value"]
    )
    return joined.select(
        "event_id", "user_id", F.col("asof_event_id"), F.col("asof_value")
    )


@register(
    "upsert_latest_wins",
    tags=("ingest", "merge", "reference:S7"),
    oracle="""
WITH existing AS (
    SELECT event_id, user_id, event_type, value FROM events WHERE event_id % 10 <= 7
),
updates AS (
    SELECT event_id, user_id, event_type, value * 2 AS value
    FROM events WHERE event_id % 10 >= 6
)
SELECT * FROM updates
UNION ALL
SELECT e.* FROM existing e
LEFT JOIN updates u ON u.event_id = e.event_id
WHERE u.event_id IS NULL
""",
)
def upsert_latest_wins_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics (update matched, insert unmatched) as one
    declarative plan — the reference's ledger upsert (ingest.py:260-266)
    generalized: existing rows (event_id%10<=7) merged with an update
    batch (event_id%10>=6, corrected values; 6-7 overlap = updates,
    8-9 = inserts). One key-pruned left_anti + union; no full-outer join,
    no window."""
    from ..operators.ingest import upsert_latest_wins

    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    existing = ev.filter(F.col("event_id") % 10 <= 7)
    updates = ev.filter(F.col("event_id") % 10 >= 6).withColumn(
        "value", F.col("value") * 2
    )
    return upsert_latest_wins(existing, updates, ["event_id"])


@register(
    "salted_segment_revenue",
    tags=("join", "skew", "salting"),
    oracle="""
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1
""",
)
def salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation path under the exact-hash gate: the event fact
    joins the customer dim through `salted_join` (hot keys split across 8
    deterministic salt buckets, dim replicated per salt) and rolls up per
    segment — result provably identical to the plain join (the oracle IS
    the plain join). At 100 TB with a power-law user distribution this
    caps any single reducer at 1/n_salts of the hottest key; AQE's
    skew-join split is the built-in alternative for sort-merge plans."""
    from ..operators.skew import salted_join

    ev = t(spark, sf_dir, "events").select("user_id", "event_id")
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    joined = salted_join(ev, cust, ["user_id"], n_salts=8)
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


@register(
    "error_burst_range_join",
    tags=("ext", "join", "range"),
    oracle="""
WITH ev AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
)
-- l is a plain filter, NOT a self-join USING (event_id) (r8, NULL-key
-- sweep): the old id-rejoin silently DROPPED error rows whose event_id
-- is NULL (NULL = NULL never matches) while Spark's filter kept them —
-- both engines now aggregate the NULL-id errors into one NULL group.
SELECT l.event_id, COUNT(*) AS n_recent
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'error') l
JOIN ev r
  ON r.user_id = l.user_id
 AND r.ts <= l.ts
 AND r.ts >= l.ts - INTERVAL 10 MINUTE
GROUP BY 1
""",
)
def error_burst_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per error event, how many events the same user produced
    in the preceding 10 minutes (inclusive; the error itself counts).
    Spark composition = time-bucketed equi-join probing two buckets —
    linear candidates, no theta-join cross product."""
    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pairs = range_join(
        errors,
        ev.select("event_id", "user_id", "ts"),
        "user_id",
        "ts",
        600,
        right_cols=["event_id"],
    )
    return pairs.groupBy(F.col("l_event_id").alias("event_id")).agg(
        F.count(F.lit(1)).alias("n_recent")
    )


@register(
    "bloom_prefiltered_dedup_ingest",
    tags=("ingest", "dedup", "bloom", "reference:J1"),
    oracle="""
WITH existing AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
batch AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 = 0)
SELECT b.doc_id, b.h AS content_hash
FROM batch b
LEFT JOIN (SELECT DISTINCT h FROM existing) e ON b.h = e.h
WHERE e.h IS NULL
""",
)
def bloom_prefiltered_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's anti-join dedup insert (J1) with a bloom-pruned
    probe (operators/ingest.bloom_prefiltered_new_rows): the existing
    corpus's content hashes fold into a 1 MB bitmap (per-partition numpy
    partials OR'd on the driver — bounded by bitmap bytes, never key
    count), batch rows that the bloom proves unseen skip the anti-join,
    and only "maybe" rows verify exactly. Result is EXACTLY the plain
    anti-join (the oracle), because blooms have no false negatives."""
    from ..operators.ingest import bloom_prefiltered_new_rows

    docs = t(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.md5("text").alias("content_hash")
    )
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.md5("text").alias("content_hash")
    )
    return bloom_prefiltered_new_rows(batch, existing, "content_hash")
