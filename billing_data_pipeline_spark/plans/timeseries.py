"""[EXT] Time-series operators over the event log: rolling time-range
windows, date-spine gap filling with LOCF, SCD2 interval builds, and
rolling distinct counts.

The reference's nearest analogue is the per-user MIN/MAX activity timeline
(reference: pipeline/assets/aggregates.py:110-111); a billing warehouse
asks the follow-up questions — "usage in the trailing 7 days", "fill the
days a customer was silent", "when did the account change state" — so the
engine ships them as first-class, oracle-checked operators.

Portability rules (what keeps the DuckDB value-hash green):
- all time arithmetic is integer epoch-microseconds / epoch-days, and all
  day/week bucketing FLOORS (matching F.window): bare integer division
  (Spark ``div``, DuckDB ``//``) truncates toward zero, which merges the
  two buckets around 1970 on pre-epoch timestamps (timewarp sweep, r4) —
  Spark sides use the exact pmod-subtract floor, oracles use
  ``_util.fdiv_sql``; no interval types cross the oracle boundary except
  as derived DATE columns;
- RANGE window frames order by the integer timestamp, so frame membership
  is exact integer comparison on both engines;
- rolling money sums accumulate in DECIMAL(30,6) and cast to double at the
  output edge (window frames are float-association traps otherwise).

Scale notes per operator are on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregates import exact_sum
from ..registry import register
from ._util import dsum_sql, fdiv_sql, floor_bucket_us, t

US_PER_DAY = 86_400_000_000
US_7D = 7 * US_PER_DAY


@register(
    "user_rolling_usage_7d",
    tags=("ext", "timeseries", "window"),
    oracle=f"""
SELECT event_id, user_id, ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS roll_events,
       CAST(CAST(SUM(CAST(CAST(value AS STRING) AS DECIMAL(30,6))) OVER w AS STRING) AS DOUBLE) AS roll_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {US_7D} PRECEDING AND CURRENT ROW)
""",
)
def user_rolling_usage_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day event count and value per user at every event — a
    RANGE frame over integer epoch-µs, so frame membership is exact on any
    engine (events at exactly ts-7d are IN the frame on both).

    Scale shape: one shuffle on user_id + an in-partition sort — the same
    cost as a groupBy; the frame is computed incrementally (no per-row
    rescan). Equal-timestamp peers share a frame by RANGE semantics, so the
    result is row-order independent."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-US_7D, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("roll_events"),
        exact_sum("value").over(w).cast("double").alias("roll_value"),
    )


@register(
    "purchase_gap_filled_locf",
    tags=("ext", "timeseries", "gapfill"),
    oracle=f"""
WITH p AS (
    SELECT user_id, {fdiv_sql('epoch_us(ts)', US_PER_DAY)} AS day, value
    FROM events WHERE event_type = 'purchase'
),
daily AS (
    SELECT user_id, day,
           {dsum_sql("value")} AS day_value,
           COUNT(*) AS day_events
    FROM p GROUP BY user_id, day
),
b AS (SELECT min(day) AS d0, max(day) AS d1 FROM p),
u AS (SELECT DISTINCT user_id FROM p),
spine AS (
    SELECT u.user_id, unnest(generate_series(b.d0, b.d1)) AS day
    FROM u CROSS JOIN b
),
j AS (
    SELECT s.user_id, s.day, d.day_value,
           COALESCE(d.day_events, 0) AS day_events
    FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
)
SELECT user_id, day,
       DATE '1970-01-01' + CAST(day AS INTEGER) AS day_date,
       CAST(day_events AS BIGINT) AS day_events,
       last_value(day_value IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM j
""",
)
def purchase_gap_filled_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily purchase series: a generated day spine (every
    user x every day in the observed range) left-joined with actual daily
    totals, silent days carried forward (LOCF) via last(ignoreNulls).

    Scale shape: the spine is |users| x |days| rows built by a per-row
    ``sequence``/explode — a generate, not a shuffle; the left join keys on
    (user, day) and co-partitions with the LOCF window's user partitioning.
    Days before a user's first purchase stay NULL (nothing to carry), and
    the LOCF value is carried, never recomputed — no float arithmetic, so
    the carried double is bit-identical on both engines."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        floor_bucket_us(US_PER_DAY).alias("day"),
        "value",
    )
    daily = p.groupBy("user_id", "day").agg(
        exact_sum("value").cast("double").alias("day_value"),
        F.count(F.lit(1)).alias("day_events"),
    )
    bounds = p.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    users = p.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = spine.join(daily, on=["user_id", "day"], how="left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("day").cast("int")).alias(
            "day_date"
        ),
        F.coalesce(F.col("day_events"), F.lit(0).cast("long")).alias("day_events"),
        F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
    )


@register(
    "user_state_scd2",
    tags=("ext", "timeseries", "scd2"),
    oracle="""
WITH seq AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    -- undated events carry no validity instant, and NULL ts would order
    -- NULLS FIRST in Spark windows vs LAST in DuckDB (review r5)
    FROM events WHERE ts IS NOT NULL
),
changes AS (
    -- row_number marks the first event; IS DISTINCT FROM is the
    -- null-safe change test (review r7: `prev IS NULL OR prev <> cur`
    -- conflated "first row" with "previous state was NULL", missing
    -- every X->NULL transition and splitting NULL-runs into spurious
    -- versions — on BOTH engines, so the hash gate alone never saw it)
    SELECT user_id, event_type AS state, ts AS valid_from, event_id
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM seq
    ) WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
           AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
            AS BIGINT) AS version,
       (lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
            IS NULL) AS is_current
FROM changes
""",
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from the event log: collapse
    consecutive equal states per user (change detection via lag), then cut
    [valid_from, valid_to) validity intervals with lead; the open interval
    is the current row. The classic CDC-log -> dimension-table operator the
    reference's append-only ledger implies but never materializes.

    Scale shape: two windows over the SAME (user_id | ts, event_id)
    partitioning — Catalyst reuses one exchange+sort for lag, the change
    filter shrinks the data, and the lead/row_number pass sorts only the
    surviving change rows."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        # first-row marker + null-safe change test (review r7): NULL is a
        # legal state value, so "changed" must be IS DISTINCT FROM, and
        # "first event" must be its own marker — `prev IS NULL` missed
        # X->NULL transitions and re-emitted every row of a NULL-run
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") == 1)
            | ~F.col("prev_type").eqNullSafe(F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


@register(
    "rolling_active_users_7d",
    tags=("ext", "timeseries", "distinct"),
    oracle=f"""
WITH du AS (
    SELECT DISTINCT user_id, {fdiv_sql('epoch_us(ts)', US_PER_DAY)} AS day FROM events
),
b AS (
    SELECT min({fdiv_sql('epoch_us(ts)', US_PER_DAY)}) AS d0,
           max({fdiv_sql('epoch_us(ts)', US_PER_DAY)}) AS d1
    FROM events
),
covered AS (
    SELECT user_id, unnest(generate_series(day, day + 6)) AS window_day
    FROM du
)
SELECT c.window_day,
       DATE '1970-01-01' + CAST(c.window_day AS INTEGER) AS window_date,
       CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_users_7d
FROM covered c CROSS JOIN b
WHERE c.window_day BETWEEN b.d0 AND b.d1
GROUP BY c.window_day
""",
)
def rolling_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users for every day — the rolling
    COUNT(DISTINCT) no engine supports as a window frame, expressed
    scalably: dedup to (user, day) pairs, explode each pair into the <=7
    window-end days it covers (bounded x7 generate), then one
    countDistinct per day.

    Scale shape: the x7 expansion happens AFTER the (user, day) dedup
    collapses raw events to at most |users| x |days| rows, so shuffle
    volume is bounded by active-pairs x 7, independent of event volume —
    vs. the naive self-join which is |days| x |events|. Leading days with
    partial windows are reported (their trailing window just starts before
    the data), bounded to the observed day range."""
    ev = t(spark, sf_dir, "events")
    day = floor_bucket_us(US_PER_DAY)
    du = ev.select("user_id", day.alias("day")).distinct()
    bounds = ev.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    covered = du.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("window_day"),
    )
    return (
        covered.crossJoin(F.broadcast(bounds))
        .filter(F.col("window_day").between(F.col("d0"), F.col("d1")))
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
        .select(
            "window_day",
            F.date_add(
                F.lit("1970-01-01").cast("date"), F.col("window_day").cast("int")
            ).alias("window_date"),
            "active_users_7d",
        )
    )


@register(
    "daily_value_ohlc",
    tags=("ext", "timeseries", "ohlc", "argminmax"),
    oracle=f"""
SELECT user_id,
       CAST({fdiv_sql('epoch_us(CAST(ts AS TIMESTAMP))', 86_400_000_000)} AS BIGINT) AS day,
       -- COALESCE(event_id, -1) (r8, NULL-key sweep): a NULL tiebreak id
       -- NULLed the whole arithmetic key, so arg_min SKIPPED the row
       -- entirely while Spark's struct key (non-NULL with a NULL field)
       -- still ranked it — the engines disagreed on which value opens
       -- the bar. Both sides now order NULL ids FIRST (-1 < every real
       -- id); two NULL-id rows at the same instant remain genuinely
       -- ambiguous (equal keys), the same irreducible class as
       -- duplicate (ts, id) pairs.
       arg_min(value, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS HUGEINT) * 10000000000 + COALESCE(event_id, -1)) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS HUGEINT) * 10000000000 + COALESCE(event_id, -1)) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {dsum_sql('value')} AS volume
FROM events
-- ts IS NOT NULL on BOTH sides (review r5): an undated row cannot form a
-- bar — and the engines disagreed on it (Spark's min_by struct key is
-- non-NULL with a NULL field and sorts it FIRST; DuckDB's arg_min key is
-- NULL and skips the row entirely)
WHERE value IS NOT NULL AND ts IS NOT NULL
GROUP BY user_id, day
""",
)
def daily_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (candlestick bars): per (user, day), the first
    (open) and last (close) observed value by event time plus high/low/
    count/volume — the classic time-series compaction, as ONE grouped
    aggregate. open/close use min_by/max_by over a (epoch-µs, event_id)
    struct: argmin/argmax inside the hash aggregate, so there is no sort
    and no window — a (user, day)-keyed exchange of one bar per group is
    the entire cost at any scale. The struct tiebreak makes the argmin
    total-ordered (duplicate timestamps resolve by event id), which is
    what lets the hash gate hold against DuckDB's arg_min/arg_max over
    an order-equivalent HUGEINT key (us * 10^10 + event_id — DuckDB's
    arg_min lacks a struct-key overload; the linear combination has the
    identical total order for event_id < 10^10)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    us = F.unix_micros(F.col("ts"))
    # COALESCE(-1): NULL tiebreak ids order FIRST on both engines — see
    # the oracle comment (r8, NULL-key sweep)
    order = F.struct(
        us.alias("us"), F.coalesce(F.col("event_id"), F.lit(-1)).alias("eid")
    )
    return ev.groupBy(
        "user_id",
        floor_bucket_us(US_PER_DAY).alias("day"),
    ).agg(
        F.min_by("value", order).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", order).alias("close"),
        F.count("*").alias("n_events"),
        exact_sum("value").cast("double").alias("volume"),
    )


@register(
    "user_time_weighted_value",
    tags=("ext", "timeseries", "twap"),
    oracle=f"""
WITH seq AS (
    SELECT user_id, value,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           lead(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS next_us
    FROM events WHERE value IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(CAST(SUM(CAST(CAST(value AS STRING) AS DECIMAL(19,6)) * (next_us - us)) AS STRING) AS DOUBLE) AS weighted_sum_us,
       CAST(SUM(next_us - us) AS BIGINT) AS span_us,
       (CAST(CAST(SUM(CAST(CAST(value AS STRING) AS DECIMAL(19,6)) * (next_us - us)) AS STRING) AS DOUBLE)
        / CAST(SUM(next_us - us) AS BIGINT)) AS twap
FROM seq
WHERE next_us IS NOT NULL AND next_us > us
GROUP BY user_id
""",
)
def user_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation is weighted by how
    long it remained current (lead(ts) - ts), the correct mean for
    irregularly-sampled series where the arithmetic mean over-weights
    bursts. ONE user-keyed exchange feeds both the lead window and the
    final group; weights are exact integer microseconds and the weighted
    sum accumulates in decimal, so the single closing division is the only
    float op — bit-identical on both engines. Zero-length intervals
    (duplicate timestamps) carry zero weight and are excluded with the
    final open-ended observation."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    seq = ev.select(
        "user_id", "value", us.alias("us"), F.lead(us).over(w).alias("next_us")
    ).filter(F.col("next_us").isNotNull() & (F.col("next_us") > F.col("us")))
    dur = F.col("next_us") - F.col("us")
    # decimal FACTOR cast (value is 6-decimal-representable), integer
    # weight: the product never exists as a double (PLANS.md trap #1)
    wsum = F.sum(F.col("value").cast("decimal(19,6)") * dur).cast("double")
    return seq.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        wsum.alias("weighted_sum_us"),
        F.sum(dur).alias("span_us"),
        (wsum / F.sum(dur)).alias("twap"),
    )


@register(
    "user_value_ewma",
    tags=("ext", "timeseries", "ewma", "recurrence"),
    oracle="""
WITH ordered AS (
    SELECT user_id,
           list(value ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS vals
    -- ts IS NOT NULL: the fold order is the event-time order, and NULL
    -- ts would sort FIRST in Spark's struct sort_array vs LAST in
    -- DuckDB's list ORDER BY (review r5)
    FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    GROUP BY user_id
)
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_obs,
       list_reduce(vals, (acc, x) -> x * 0.5 + acc * 0.5) AS ewma
FROM ordered
""",
)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.5) per user — a
    LINEAR RECURRENCE (y_t = a*x_t + (1-a)*y_{t-1}), the class of
    computation neither a window frame nor a grouped aggregate can
    express. Here it runs as an in-row sequential fold: collect the
    user's values in event order (sort_array fixes the order inside the
    row), seed with the first value, fold the rest left-to-right — the
    exact association DuckDB's list_reduce performs, term order pinned by
    the same (epoch-µs, event_id) sort key, so the recursively-built
    double is bit-identical. alpha = 0.5 keeps each step at two exact
    halvings + one IEEE add.

    Scale shape: one user-keyed exchange; state = the user's own history
    inside its row (same memory contract as user_event_transcripts). For
    unbounded histories the streaming twin is applyInPandasWithState
    (streaming/stateful.py) carrying (y_prev) as state — this batch form
    is the oracle-checkable fixture of that recurrence."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    ordered = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("us"),
                    F.col("event_id").alias("eid"),
                    F.col("value").alias("x"),
                )
            )
        ).alias("seq")
    )
    vals = F.col("seq").getField("x")
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: x * F.lit(0.5) + acc * F.lit(0.5),
    )
    return ordered.select(
        "user_id",
        F.size(vals).cast("long").alias("n_obs"),
        ewma.alias("ewma"),
    )
