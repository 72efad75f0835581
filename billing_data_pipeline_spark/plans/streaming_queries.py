"""[EXT] Event-time windowed queries over events (SURVEY.md §2.9 EXT).

Registered in batch mode — ``window()`` and ``session_window()`` are the
same expressions Structured Streaming uses, so these queries ARE the
streaming aggregations, minus the unbounded source; the true streaming
execution paths (readStream, watermarks, AvailableNow catch-up,
dropDuplicatesWithinWatermark) live in ``billing_data_pipeline_spark.
streaming`` and are exercised by tests/test_streaming.py.

Window starts are emitted as epoch seconds/microseconds (BIGINT): exact
integer arithmetic on both engines, no timestamp-precision hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import exact_sum
from ..registry import register
from ._util import dsum_sql, fdiv_sql, t

# epoch_us(CAST(ts AS TIMESTAMP)) — DuckDB-side exact event-time in µs.
TS_US = "epoch_us(CAST(ts AS TIMESTAMP))"


@register(
    "tumbling_event_counts",
    tags=("streaming", "window"),
    oracle=f"""
SELECT ({fdiv_sql(TS_US, 600_000_000)}) * 600 AS window_start_sec,
       event_type,
       COUNT(*) AS n,
       {dsum_sql('value')} AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
)
def tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows per event type — the canonical
    streaming aggregate (streaming form adds withWatermark; see
    streaming/event_windows.py)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_sec"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "sliding_window_volume",
    tags=("streaming", "window"),
    oracle=f"""
SELECT (({fdiv_sql(TS_US, 300_000_000)}) - off.o) * 300 AS window_start_sec,
       COUNT(*) AS n,
       {dsum_sql('value')} AS total_value
FROM events, (VALUES (0), (1)) AS off(o)
WHERE ts IS NOT NULL
GROUP BY 1
""",
)
def sliding_window_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide): every event lands in
    exactly two windows; the oracle replays that expansion with an explicit
    offset cross join."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_sec"),
            "n",
            "total_value",
        )
    )


_STREAM_EVENTS_SCHEMA = (
    "event_id long, ts {ts_type}, user_id long, event_type string, "
    "value double, props string"
)

# Scratch dirs from PRIOR stream builds: every catalog streaming query
# builds its source dir and drains it synchronously (run_to_memory awaits
# termination), so by the time the NEXT query builds, earlier dirs — and
# the copied events file in the flushed variant — are dead weight. Sweeping
# them here bounds /tmp usage over a long bench/test session (review r3).
_SCRATCH_DIRS: list[str] = []


def _stream_scratch_dir(prefix: str) -> str:
    import shutil
    import tempfile

    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d


# ts storage-type probe results per sf_dir: the footer never changes within
# a session, but an uncached probe is a ~0.1 s batch metadata job per stream
# declaration — at 12 streaming catalog queries (plus bench's min-of-3 loop)
# that is pure repeated overhead.
_TS_STORED_LONG: dict[str, bool] = {}


def _probe_ts_stored_long(spark: SparkSession, sf_dir: str) -> bool:
    """Cached footer probe: does this sf_dir's events table store ts as
    INT64 TIMESTAMP(NANOS) (=> declare ``ts long`` + nanosAsLong)? The ONE
    place the probe-and-conf dance lives (review r5: it was copied in
    _declare_event_stream and _stream_events_flushed, so a probe fix had
    to land twice or the two paths diverged)."""
    from ..sources.tables import events_ts_is_nanos

    if sf_dir not in _TS_STORED_LONG:
        _TS_STORED_LONG[sf_dir] = events_ts_is_nanos(f"{sf_dir}/events.parquet")
    if _TS_STORED_LONG[sf_dir]:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _TS_STORED_LONG[sf_dir]


def _declare_event_stream(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Declare the events file-source STREAM over ``stream_dir``. The
    driver's parquet has shipped ``ts`` as either INT64 TIMESTAMP(NANOS)
    or TIMESTAMP(MICROS) across rounds, so probe the footer (pyarrow —
    no session conf involved) and declare the matching schema — same
    µs-floor convention as sources/tables.load_table. The legacy
    nanosAsLong conf is set only when the table actually stores nanos,
    where the batch reader needs it too (review r4: it was set
    unconditionally, session-wide)."""
    stored_long = _probe_ts_stored_long(spark, sf_dir)
    decl = _STREAM_EVENTS_SCHEMA.format(
        ts_type="long" if stored_long else "timestamp_ntz"
    )
    reader = spark.readStream.schema(decl)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(stream_dir)
    if stored_long:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _table_data_files(src: str) -> list[str]:
    """Data files of a parquet table path: the single file itself, or the
    sorted part files when the table is a Spark-written DIRECTORY (the
    scale probe's scaled dirs, any ``df.write.parquet`` output). The
    file-source stream lists a flat directory and does NOT recurse into a
    symlinked subdirectory — linking a directory as if it were a file
    produced a silent 0-row drain (found by the r4 growth probe)."""
    import glob
    import os

    if os.path.isdir(src):
        return sorted(glob.glob(os.path.join(src, "*.parquet")))
    return [src]


def _ts_is_int96(p: str) -> bool:
    """True when a parquet file stores ``ts`` as INT96 — Spark's DEFAULT
    ``outputTimestampType``, so any plain df.write.parquet events table
    ships this way. The stream schema declares INT64 µs (timestamp_ntz),
    which Spark's parquet reader refuses to fill from INT96 — such files
    are rewritten µs-normalized instead of symlinked (review r5)."""
    import pyarrow.parquet as pq

    s = pq.ParquetFile(p).metadata.schema
    return any(
        s.column(i).name == "ts" and s.column(i).physical_type == "INT96"
        for i in range(len(s))
    )


def _deliver(
    src: str, dest_dir: str, prefix: str, mtime: float | None = None
) -> int:
    """Materialize one DELIVERY of a parquet table into the stream dir:
    symlinks when mtime control isn't needed, copies pinned to ``mtime``
    when it is (the file source orders files by mtime — see
    _stream_events_flushed). INT96-timestamp files (Spark's default write
    form) are rewritten with ts cast to µs so they satisfy the declared
    stream schema. Symlink targets are made ABSOLUTE — a relative source
    path stored verbatim would resolve against the /tmp scratch dir and
    either error or silently drain 0 rows (review r5). Returns the file
    count delivered."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    files = _table_data_files(src)
    for i, p in enumerate(files):
        dest = os.path.join(dest_dir, f"{prefix}_{i:05d}.parquet")
        if _ts_is_int96(p):
            tbl = pq.read_table(p)
            tbl = tbl.set_column(
                tbl.schema.get_field_index("ts"),
                "ts",
                tbl.column("ts").cast(pa.timestamp("us")),
            )
            pq.write_table(tbl, dest)
            if mtime is not None:
                os.utime(dest, (mtime, mtime))
        elif mtime is None:
            os.symlink(os.path.abspath(p), dest)
        else:
            shutil.copyfile(p, dest)
            os.utime(dest, (mtime, mtime))
    return len(files)


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source STREAM over the events table (symlinks into a scratch
    directory — the file source wants a directory and derives basePath
    from it). No maxFilesPerTrigger => the whole table is ONE micro-batch
    whether it ships as a single file or a directory of parts."""
    stream_dir = _stream_scratch_dir("events_stream_")
    _deliver(f"{sf_dir}/events.parquet", stream_dir, "events")
    return _declare_event_stream(spark, sf_dir, stream_dir)


@register(
    "streaming_tumbling_catchup",
    tags=("streaming", "window", "true-stream"),
    bench=True,  # r4: the perf gate sees one TRUE-stream family member
    oracle=f"""
SELECT ({fdiv_sql(TS_US, 600_000_000)}) * 600 AS window_start_sec,
       event_type,
       COUNT(*) AS n
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
)
def streaming_tumbling_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming execution: readStream file source ->
    watermarked tumbling aggregate -> Trigger.AvailableNow drain into a
    memory sink (complete mode == batch result on finite input). The
    streaming module's full test surface is tests/test_streaming.py; this
    entry keeps one real streaming path under the driver's oracle gate."""
    from .._names import uid_name

    from ..streaming.event_windows import run_to_memory, tumbling_counts_stream

    sdf = tumbling_counts_stream(_stream_events(spark, sf_dir))
    return run_to_memory(sdf, uid_name("catchup"), "complete")


@register(
    "streaming_dedup_catchup",
    tags=("streaming", "dedup", "true-stream"),
    oracle="""
SELECT event_id, user_id, event_type
FROM events
WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '1970-01-01 00:00:00'
""",
)
def streaming_dedup_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming dedup under re-delivery: the events file is delivered
    TWICE (two paths, one micro-batch each via maxFilesPerTrigger=1 — the
    at-least-once replay every file/queue source exhibits), and
    ``dropDuplicatesWithinWatermark(event_id)`` collapses the second
    delivery: in-horizon replays hit dedup state, out-of-horizon replays
    are dropped as late — either way each event emits exactly once, which
    is what the plain-SELECT oracle asserts. State is bounded by the
    watermark horizon, never by stream length (the reference's run-key
    idempotency ST4, as a streaming-native operator). Event times at or below Structured Streaming's INITIAL
    watermark (epoch 0) are dropped as late on arrival (measured:
    ts == 0 drops, the boundary is strict) — the oracle states that
    contract with its ts > epoch filter (timewarp sweep, r4)."""
    import time as _time
    from .._names import uid_name

    from ..streaming.event_windows import run_to_memory, streaming_dedup

    # Each delivery must be ONE micro-batch (a per-part batch could
    # advance the watermark past a later part's still-unseen FIRST
    # deliveries — parts are not ts-sorted — and drop them as late), and
    # delivery 1 must process BEFORE delivery 2: copies pinned to two
    # ascending mtimes (the file source orders by mtime) +
    # maxFilesPerTrigger = files-per-delivery guarantee both for single-
    # file AND directory-shaped tables (see _table_data_files).
    stream_dir = _stream_scratch_dir("events_stream_dup_")
    now = _time.time()
    n_files = _deliver(f"{sf_dir}/events.parquet", stream_dir, "a", mtime=now - 60)
    _deliver(f"{sf_dir}/events.parquet", stream_dir, "b", mtime=now - 30)
    raw = _declare_event_stream(
        spark, sf_dir, stream_dir, max_files_per_trigger=n_files
    )
    deduped = streaming_dedup(raw, ["event_id"], watermark="2 days").select(
        "event_id", "user_id", "event_type"
    )
    return run_to_memory(deduped, uid_name("sdedup"), "append")


@register(
    "streaming_interval_join_catchup",
    tags=("streaming", "join", "true-stream"),
    oracle=f"""
WITH ev AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
    WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '1970-01-01 00:00:00'
)
SELECT c.user_id,
       c.event_id AS left_id,
       p.event_id AS right_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM ev c
JOIN ev p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
)
def streaming_interval_join_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream interval join (click->purchase within 30 min per
    user), drained with Trigger.AvailableNow in append mode and checked
    against the batch interval-join oracle under the exact-hash gate.
    Watermarks on both branches + two-sided time bound keep join state
    finite on an unbounded stream; lag is exact integer microseconds. Event times at or below Structured Streaming's INITIAL
    watermark (epoch 0) are dropped as late on arrival (measured:
    ts == 0 drops, the boundary is strict) — the oracle states that
    contract with its ts > epoch filter (timewarp sweep, r4)."""
    from .._names import uid_name

    from ..streaming.event_windows import interval_join_stream, run_to_memory

    sdf = interval_join_stream(_stream_events(spark, sf_dir))
    return run_to_memory(sdf, uid_name("ssjoin"), "append")


def _stream_events_flushed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`_stream_events` plus two future-dated sentinel files and
    ``maxFilesPerTrigger=1``, so the drain runs as (events, s1, s2) micro-
    batches. Outer joins / append-mode aggregates only emit a row once the
    watermark PASSES its horizon, and the watermark used in batch N is
    computed from batch N-1's data — so on a finite stream the final
    horizon's rows never flush on their own. The sentinels (user_id=-1,
    one click + one purchase each, at max_ts+3h and +4h) advance the
    watermark in two steps: batch 2 runs with the watermark derived from
    the real data, batch 3 runs with max_ts+3h-2h = max_ts+1h — past every
    real event's horizon — so ALL real-row state flushes by end of drain.
    Callers must filter ``user_id >= 0``."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.tables import load_table

    stored_long = _probe_ts_stored_long(spark, sf_dir)
    max_us = (
        load_table(spark, sf_dir, "events")
        .agg(F.max(F.unix_micros("ts")))
        .collect()[0][0]
    )
    if max_us is None:  # empty events table: sentinels anchor at epoch
        max_us = 0
    stream_dir = _stream_scratch_dir("events_stream_flush_")
    # COPY (not symlink) so the events file's mtime is ours to pin: the
    # file source orders files by mtime, and a freshly regenerated
    # events.parquet (mtime within ~20 s of now) would otherwise sort
    # AFTER the past-dated sentinels — the sentinels then advance the
    # watermark past max_ts+1h before any real event is read and the join
    # drops every real row as late (ADVICE r2). Pinning all three mtimes
    # relative to each other makes ordering environment-independent.
    import shutil

    src = f"{sf_dir}/events.parquet"
    src_files = _table_data_files(src)
    if os.path.isdir(src) or (src_files and _ts_is_int96(src_files[0])):
        # Directory-shaped table: the sentinel flush needs per-FILE batch
        # granularity (maxFilesPerTrigger=1), so the real events must be
        # ONE file — merge the parts (driver-side, bounded by the local
        # test scale; production flushes come from the live stream, not
        # this finite-drain shim). INT96 sources (Spark's default write
        # form) are µs-normalized on the way so the merged file matches
        # the declared stream schema (review r5).
        tbl = pa.concat_tables([pq.read_table(p) for p in src_files])
        if not stored_long:
            tbl = tbl.set_column(
                tbl.schema.get_field_index("ts"),
                "ts",
                tbl.column("ts").cast(pa.timestamp("us")),
            )
        pq.write_table(tbl, f"{stream_dir}/events.parquet")
    else:
        shutil.copyfile(src, f"{stream_dir}/events.parquet")
    now = time.time()
    os.utime(f"{stream_dir}/events.parquet", (now - 30, now - 30))
    ts_field = (
        pa.field("ts", pa.int64())
        if stored_long
        else pa.field("ts", pa.timestamp("us"))
    )
    schema = pa.schema(
        [
            pa.field("event_id", pa.int64()),
            ts_field,
            pa.field("user_id", pa.int64()),
            pa.field("event_type", pa.string()),
            pa.field("value", pa.float64()),
            pa.field("props", pa.string()),
        ]
    )
    for i, hours in enumerate((3, 4)):
        us = max_us + hours * 3600 * 1_000_000
        ts_vals = [us * 1000] * 2 if stored_long else pa.array([us] * 2, pa.timestamp("us"))
        tbl = pa.table(
            {
                "event_id": [-(2 * i + 1), -(2 * i + 2)],
                "ts": ts_vals,
                "user_id": [-1, -1],
                "event_type": ["click", "purchase"],
                "value": [0.0, 0.0],
                "props": [None, None],
            },
            schema=schema,
        )
        path = f"{stream_dir}/zz_sentinel_{i}.parquet"
        pq.write_table(tbl, path)
        # distinct ascending mtimes => file-source processes sentinels last;
        # keep them in the PAST — future-dated files are not served
        os.utime(path, (now - 20 + 10 * i, now - 20 + 10 * i))
    return _declare_event_stream(spark, sf_dir, stream_dir, max_files_per_trigger=1)


@register(
    "streaming_left_outer_join_catchup",
    tags=("streaming", "join", "outer", "true-stream"),
    oracle="""
WITH ev AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
    WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '1970-01-01 00:00:00'
)
SELECT c.user_id,
       c.event_id AS left_id,
       p.event_id AS right_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM ev c
LEFT JOIN ev p
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click'
""",
)
def streaming_left_outer_join_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream LEFT OUTER interval join: click->purchase
    attribution WITH the abandoned clicks (NULL right side). The outer
    rows exercise watermark-driven state finalization — Spark emits a
    null-padded row only once the watermark proves no match can still
    arrive — and the finite drain flushes completely thanks to
    `_stream_events_flushed`'s sentinel batches. Hash-checked against the
    plain SQL LEFT JOIN, so the eviction logic must emit each unmatched
    click EXACTLY once (a dropped or duplicated outer row flips the
    hash). Event times at or below Structured Streaming's INITIAL
    watermark (epoch 0) are dropped as late on arrival (measured:
    ts == 0 drops, the boundary is strict) — the oracle states that
    contract with its ts > epoch filter (timewarp sweep, r4)."""
    from .._names import uid_name

    from ..streaming.event_windows import interval_join_stream, run_to_memory

    sdf = interval_join_stream(_stream_events_flushed(spark, sf_dir), how="leftOuter")
    # Drop the sentinel rows AFTER the drain: a user_id filter inside the
    # streaming plan would push through the join into the click-branch file
    # scan, where parquet min/max stats prune the sentinel FILES themselves
    # — and with them the watermark advance they exist to provide.
    out = run_to_memory(sdf, uid_name("ssloj"), "append")
    # NULL-user clicks are legitimate unmatched outer rows the oracle's
    # LEFT JOIN keeps — a bare >= 0 evaluates NULL and dropped them
    # (review r5); sentinels are always user_id = -1, never NULL
    return out.filter(F.col("user_id").isNull() | (F.col("user_id") >= 0))


@register(
    "streaming_enrich_catchup",
    tags=("streaming", "join", "true-stream"),
    oracle=f"""
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       {dsum_sql('e.value')} AS total_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1
""",
)
def streaming_enrich_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-static enrichment join: the event stream joins the
    static customer dimension (broadcast, stateless — no join state, the
    dim re-plans per micro-batch) and rolls up per market segment, drained
    with AvailableNow in complete mode. The streaming twin of the batch
    star-join rule: the fact stream never shuffles for the join at any
    scale. Hash-checked against the plain SQL join+group."""
    from .._names import uid_name

    from ..streaming.event_windows import enriched_segment_stream, run_to_memory

    cust = t(spark, sf_dir, "customer")
    sdf = enriched_segment_stream(_stream_events(spark, sf_dir), cust)
    return run_to_memory(sdf, uid_name("enrich"), "complete")


@register(
    "streaming_stateful_totals",
    tags=("streaming", "stateful", "true-stream"),
    oracle="""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
""",
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState per-user running totals drained with
    AvailableNow (update mode; arbitrary-state API). The drained FINAL
    state's event count per user is order-independent (integers), so it is
    oracle-checked against a plain per-user COUNT(*); the float
    total_value column stays out of the output because in-batch row order
    makes it engine-private."""
    from .._names import uid_name

    from ..streaming.event_windows import run_to_memory
    from ..streaming.stateful import stateful_user_totals

    sdf = stateful_user_totals(_stream_events(spark, sf_dir))
    sink = run_to_memory(sdf, uid_name("stateful"), "update")
    return sink.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


@register("incremental_rollup_merge", tags=("incremental", "approx", "sketch"))
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-aggregate path (operators/incremental.py) end-to-end in
    one plan: two disjoint event batches -> partial aggregates (decimal sum
    + HLL sketch) -> merge -> finalize. Counts/sums are exact; the distinct
    estimate is a DataSketches HLL => rows-only (equivalence to full
    recompute is proven in tests/test_scale_patterns.py)."""
    from ..operators.incremental import (
        finalize_profile,
        merge_partials,
        partial_profile,
    )

    ev = t(spark, sf_dir, "events")
    groups = ["event_type"]
    distincts = {"unique_users": "user_id"}
    p1 = partial_profile(
        ev.filter(F.col("event_id") % 2 == 0), groups, "value", distincts
    )
    p2 = partial_profile(
        ev.filter(F.col("event_id") % 2 == 1), groups, "value", distincts
    )
    return finalize_profile(
        merge_partials(p1.unionByName(p2), groups, distincts), distincts
    )


@register(
    "session_window_stats",
    tags=("streaming", "session"),
    oracle=f"""
WITH seq AS (
    SELECT user_id, event_id, {TS_US} AS ts_us,
           lag({TS_US}) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
    FROM events
    WHERE ts IS NOT NULL
),
marks AS (
    SELECT user_id, event_id, ts_us,
           CASE WHEN prev_us IS NULL OR ts_us - prev_us <= 1800 * 1000000
                THEN 0 ELSE 1 END AS new_session
    FROM seq
),
sessions AS (
    SELECT user_id, ts_us,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marks
)
SELECT user_id,
       CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30-minute gap) per user — per-session
    start + event count. The oracle reconstructs identical sessions with
    lag/cumsum (events exactly at the gap boundary extend the session on
    both paths)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
        )
    )


@register(
    "streaming_session_catchup",
    tags=("streaming", "session", "true-stream"),
    oracle=f"""
WITH seq AS (
    SELECT user_id, event_id, {TS_US} AS ts_us,
           lag({TS_US}) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
    FROM events
    WHERE {TS_US} > -1800 * 1000000
),
marks AS (
    SELECT user_id, event_id, ts_us,
           CASE WHEN prev_us IS NULL OR ts_us - prev_us <= 1800 * 1000000
                THEN 0 ELSE 1 END AS new_session
    FROM seq
),
sessions AS (
    SELECT user_id, ts_us,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marks
)
SELECT user_id,
       CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def streaming_session_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming session windows: readStream -> watermarked
    session_window(gap=30m) per user -> AvailableNow drain to a memory sink
    (complete mode on finite input == the oracle-checked batch twin,
    session_window_stats). Exercises Spark's merging-session state store
    under the exact-hash gate. Sessions whose END (ts + gap) would sit at
    or below Structured Streaming's INITIAL watermark (epoch 0) are
    dropped as late on arrival — measured: a ts = -1 µs row survives
    (its 30-min session end is past the epoch) while pre-(epoch - gap)
    rows drop; the oracle states that contract with its
    ts > -gap filter (timewarp sweep, r4)."""
    from .._names import uid_name

    from ..streaming.event_windows import run_to_memory, session_stats_stream

    sdf = session_stats_stream(_stream_events(spark, sf_dir))
    return run_to_memory(sdf, uid_name("sess_catchup"), "complete")


@register(
    "streaming_sliding_catchup",
    tags=("streaming", "window", "true-stream"),
    oracle=f"""
SELECT (({fdiv_sql(TS_US, 300_000_000)}) - off.o) * 300 AS window_start_sec,
       COUNT(*) AS n
FROM events, (VALUES (0), (1)) AS off(o)
WHERE ts IS NOT NULL
GROUP BY 1
""",
)
def streaming_sliding_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming sliding windows (10 min / 5 min slide) drained with
    AvailableNow into a memory sink — completes the true-stream trio
    (tumbling / session / sliding), each hash-checked against the same
    oracle as its batch twin."""
    from .._names import uid_name

    from ..streaming.event_windows import run_to_memory, sliding_volume_stream

    sdf = sliding_volume_stream(_stream_events(spark, sf_dir))
    return run_to_memory(sdf, uid_name("slide_catchup"), "complete")


@register(
    "streaming_ohlc_catchup",
    tags=("streaming", "ohlc", "argminmax", "true-stream"),
    oracle=f"""
SELECT user_id,
       ({fdiv_sql(TS_US, 86_400_000_000)}) * 86400 AS window_start_sec,
       -- COALESCE(-1): NULL tiebreak ids order FIRST on both engines —
       -- the batch twin's contract (timeseries.daily_value_ohlc, r8)
       arg_min(value, CAST({TS_US} AS HUGEINT) * 10000000000 + COALESCE(event_id, -1)) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, CAST({TS_US} AS HUGEINT) * 10000000000 + COALESCE(event_id, -1)) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
WHERE value IS NOT NULL AND ts IS NOT NULL
GROUP BY user_id, window_start_sec
""",
)
def streaming_ohlc_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming OHLC bars: the argmin-in-aggregate candlestick
    compaction (batch twin: daily_value_ohlc) running as a watermarked
    Structured Streaming aggregate, drained with AvailableNow in complete
    mode. min_by/max_by state merges incrementally across micro-batches —
    first/last-by-event-time per bar WITHOUT buffering the bar's events —
    and the (epoch-µs, event_id) order key keeps the merge total-ordered,
    so the drained table hash-matches the batch oracle exactly."""
    from .._names import uid_name

    from ..streaming.event_windows import ohlc_stream, run_to_memory

    sdf = ohlc_stream(_stream_events(spark, sf_dir))
    return run_to_memory(sdf, uid_name("ohlc"), "complete")
