"""Python DataSource (Spark 4 API) for URL-addressed CSV — the reference's
remote-ingestion path (SURVEY.md §2.1 S2/S5) as a real executor-side source.

The reference fetches partition CSVs with s3fs and falls back to streamed
HTTP chunks on the driver box (reference: pipeline/s3_utils.py:159-246),
serializing all I/O through one node. Here each URL becomes an
InputPartition, so N files download and parse on N executor cores in
parallel, with the reference's retry behavior per partition; nothing ever
stages on the driver.

Role at scale: s3a:// + the native CSV reader remain the first-choice path
(JVM, vectorized, splittable). This source exists for endpoints Hadoop has
no connector for — signed HTTP APIs, on-prem object stores — where the
alternative is the reference's driver-side download loop. One URL = one
task = one partition, so parallelism equals file count, the right unit for
partition-per-day lake layouts.

Usage::

    spark.dataSource.register(HttpCsvDataSource)
    df = (spark.read.format("http_csv")
          .schema("ts timestamp, user_id string, amount double")
          .option("urls", "https://host/a.csv\\nfile:///data/b.csv")
          .load())
"""

from __future__ import annotations

import csv
import io
import time
from datetime import date, datetime
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)


class UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


_BOOL_TRUE = ("true", "1", "t", "yes")
_BOOL_FALSE = ("false", "0", "f", "no")


def _convert(value: str, dtype):
    """CSV string -> Spark external type. Empty string => NULL (the
    reference relied on DuckDB's read_csv_auto doing the same).
    Unparseable values raise ValueError — the CALLER decides whether
    that nulls the field (permissive) or fails the read (failfast);
    boolean garbage ('flase') raises instead of silently coercing to
    False (review r4)."""
    if value == "" or value is None:
        return None
    if isinstance(dtype, StringType):
        return value
    if isinstance(dtype, (IntegerType, LongType)):
        return int(value)
    if isinstance(dtype, (DoubleType, FloatType)):
        return float(value)
    if isinstance(dtype, BooleanType):
        s = value.strip().lower()
        if s in _BOOL_TRUE:
            return True
        if s in _BOOL_FALSE:
            return False
        raise ValueError(f"not a boolean: {value!r}")
    if isinstance(dtype, TimestampType):
        # RFC3339 'Z' suffix: Python 3.10's fromisoformat rejects it
        # (3.11+ accepts) — under the permissive handler every Z-suffixed
        # feed would silently ingest as NULL timestamps on the declared
        # 3.10 floor (review r7). Only a TRAILING designator is rewritten
        # (review r8): a blanket replace() mangled mid-string Zs in
        # malformed values before fromisoformat could reject them cleanly.
        if value.endswith("Z"):
            value = value[:-1] + "+00:00"
        return datetime.fromisoformat(value)
    if isinstance(dtype, DateType):
        return date.fromisoformat(value)
    # explicit fall-through error (review r7): returning the raw string
    # for an unhandled type (Decimal, Short, Array, ...) died later in
    # Spark's row conversion with an opaque serialization error — and the
    # permissive handler, which catches ValueError, never saw it
    raise ValueError(
        f"http_csv: unsupported field type {dtype!r} (supported: string, "
        "int/long, float/double, boolean, timestamp, date)"
    )


class HttpCsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        # Unsupported SCHEMA types fail at plan time in every mode
        # (review r7): this is a schema problem, not a data problem — in
        # permissive mode the per-value ValueError would otherwise
        # silently null the entire column row by row.
        for f in schema.fields:
            if not isinstance(
                f.dataType,
                (StringType, IntegerType, LongType, DoubleType,
                 FloatType, BooleanType, TimestampType, DateType),
            ):
                raise TypeError(
                    f"http_csv: unsupported type {f.dataType!r} for field "
                    f"{f.name!r} (supported: string, int/long, "
                    "float/double, boolean, timestamp, date)"
                )
        raw = options.get("urls") or options.get("path") or ""
        # Newlines always separate. Commas separate ONLY when no URL in
        # the option carries a query string: signed/presigned URLs (the
        # module's stated use case) legitimately contain commas in their
        # query ('?fields=a,b&sig=...') and comma-splitting mangled them
        # into bogus partitions (review r5).
        lines = [u.strip() for u in raw.splitlines() if u.strip()]
        # ...decided PER LINE (review r7): one signed URL in the option
        # must not suppress comma-splitting for the other lines — mixing
        # a plain 'a.csv,b.csv' line with a '?sig=' line previously fused
        # the former into one bogus URL.
        self.urls = []
        for part in lines:
            if "?" in part:
                self.urls.append(part)
            else:
                self.urls.extend(u.strip() for u in part.split(",") if u.strip())
        if not self.urls:
            raise ValueError("http_csv: provide 'urls' (comma/newline separated)")
        self.header = (options.get("header") or "true").lower() == "true"
        self.retries = int(options.get("retries") or 3)
        self.permissive = (options.get("mode") or "permissive").lower() != "failfast"

    def partitions(self):
        # One URL per partition: parallelism = file count, matching the
        # lake's partition-per-day layout.
        return [UrlPartition(u) for u in self.urls]

    def _open(self, url: str):
        """Streamed open with bounded retries (the reference's 3-attempt
        loop, reference: pipeline/s3_utils.py:200-239) — executor-side."""
        from urllib.request import urlopen

        last = None
        # retries = total attempts; floor at one so retries=0 still makes
        # a single attempt instead of `raise None` (review r3)
        attempts = max(1, self.retries)
        for attempt in range(attempts):
            try:
                # bounded timeout (review r5): the default None blocks the
                # executor task forever on a half-open connection — the
                # retry loop only ever sees raised errors
                return urlopen(url, timeout=60)  # noqa: S310 (scheme from config)
            except Exception as e:  # pragma: no cover - network flake path
                last = e
                if attempt < attempts - 1:  # no dead sleep after the last try
                    time.sleep(min(2**attempt, 5))
        raise last

    def read(self, partition: UrlPartition) -> Iterator[tuple]:
        """Permissive mode follows Spark's CSV PERMISSIVE contract (and
        DuckDB's read_csv_auto, which the module cites as the model): a
        malformed row is KEPT with its bad fields nulled — short rows pad
        with NULL, extra columns are ignored, an unparseable typed field
        nulls that field only. The previous behavior silently DROPPED the
        whole row, which is DROPMALFORMED semantics under a permissive
        name — silent data loss (review r4). failfast raises on any of
        these."""
        fields = self.schema_.fields
        with self._open(partition.url) as resp:
            text = io.TextIOWrapper(resp, encoding="utf-8", newline="")
            rows = csv.reader(text)
            if self.header:
                next(rows, None)
            for rec in rows:
                if len(rec) != len(fields):
                    if not self.permissive:
                        raise ValueError(
                            f"http_csv: row has {len(rec)} columns, "
                            f"schema has {len(fields)}: {rec!r}"
                        )
                    rec = list(rec[: len(fields)]) + [None] * (
                        len(fields) - len(rec)
                    )
                out = []
                for v, f in zip(rec, fields):
                    try:
                        out.append(_convert(v, f.dataType))
                    except (ValueError, TypeError):
                        if not self.permissive:
                            raise
                        out.append(None)
                yield tuple(out)


class HttpCsvStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: the URL list is a totally ordered log and the offset
    is an index into it — each micro-batch ingests the next unread URLs.

    This is the reference's polling sensor (pipeline/pipeline.py:41-96:
    compare cursor against newly listed partitions, emit a run per new
    batch) recast as a checkpointable stream source: the offset {"idx": n}
    plays the sensor cursor, Spark's checkpoint persists it, and replay
    after failure re-reads exactly the uncommitted suffix. Pair with the
    idempotent foreachBatch sink for end-to-end effectively-once.
    """

    def __init__(self, schema: StructType, options):
        self.batch = HttpCsvReader(schema, options)
        self.per_trigger = int(options.get("urlspertrigger") or 1)

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        lo = start["idx"]
        hi = min(lo + self.per_trigger, len(self.batch.urls))
        end = {"idx": hi}
        return self.readBetweenOffsets(start, end), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # Materialized list-iterator, not a generator: the simple-reader
        # wrapper prefetches on the driver and PICKLES the iterator for
        # replay (list_iterator pickles, generators don't). Per-trigger
        # batches are bounded by urlsPerTrigger — the documented memory
        # contract of the simple API (use the full DataSourceStreamReader
        # for executor-side partition reads).
        rows = []
        for url in self.batch.urls[start["idx"] : end["idx"]]:
            rows.extend(self.batch.read(UrlPartition(url)))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — the URL log is immutable


class HttpCsvDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "http_csv"

    def schema(self):
        # Schema must be supplied by the caller (.schema(...)); CSV-over-HTTP
        # has no footer to infer from without a second fetch.
        raise NotImplementedError(
            "http_csv requires an explicit .schema(...) — remote CSV has "
            "nothing to infer from without double-fetching"
        )

    def reader(self, schema: StructType) -> HttpCsvReader:
        return HttpCsvReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> HttpCsvStreamReader:
        return HttpCsvStreamReader(schema, self.options)
