"""Scalar-function catalog queries (SURVEY.md §2.8): the F1-F8 surface the
reference ran host-side, exercised as column expressions under the oracle
gate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import (
    basename,
    date_spine,
    hive_partition_value,
    parse_url_col,
    row_content_hash,
    row_content_hash_sql,
)
from ..registry import register
from ._util import t


@register(
    "scalar_function_matrix",
    tags=("scalar", "reference:F1,F2,F4,F7"),
    oracle=rf"""
SELECT o_orderkey,
       {row_content_hash_sql("o_orderkey", "o_orderstatus")} AS key_hash,
       strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS month_start,
       regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_code,
       printf('%08d', o_orderkey) AS padded_key
FROM orders
WHERE o_orderkey % 50 = 0
""",
)
def scalar_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row hashing (F1), date format/arithmetic/construction (F2-F4), regexp
    extraction (F5-shape), and printf formatting (F7) in one projection —
    all JVM built-ins, no UDFs (reference ran every one of these in host
    Python: ingest.py:218-220, 44-63; s3_utils.py:272-276; reports.py:74)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        row_content_hash("o_orderkey", "o_orderstatus").alias("key_hash"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.make_date(
            F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)
        ).alias("month_start"),
        F.regexp_extract("o_orderpriority", r"(\d+)", 1).alias("prio_code"),
        F.format_string("%08d", "o_orderkey").alias("padded_key"),
    )


@register(
    "date_spine_coverage",
    tags=("scalar", "reference:F3"),
    oracle="""
WITH spine AS (
    SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31',
                                  INTERVAL 1 DAY)) AS d
)
SELECT CAST(s.d AS DATE) AS d,
       COUNT(o.o_orderkey) AS n_orders
FROM spine s
LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = CAST(s.d AS DATE)
GROUP BY 1
""",
)
def date_spine_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range generation (F3: the reference's Python day-walk as
    sequence+explode) left-joined to orders — gap days survive with zero
    counts (the shape a backfill-completeness check needs)."""
    spine = date_spine(spark, "1996-01-01", "1996-03-31")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_orderdate").cast("date").alias("od")
    )
    return (
        spine.join(o, spine.d == o.od, "left")
        .groupBy("d")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "url_and_path_parsing",
    tags=("scalar", "reference:F5,F6,F8"),
    oracle="""
SELECT doc_id,
       regexp_extract(url, '^([a-z0-9]+)://', 1) AS protocol,
       regexp_extract(url, '^[a-z0-9]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z0-9]+://[^/]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '(?:^|[/?&#])source=([^/&?#]+)', 1) AS source_param,
       split_part(url, '/', -1) AS fname
FROM (
    SELECT doc_id,
           'https://' || COALESCE(source, 'unknown') ||
           '.example.com/docs/source=' || COALESCE(source, 'unknown') ||
           '/doc-' || CAST(doc_id AS VARCHAR) || '.txt' AS url
    FROM documents
    WHERE doc_id % 25 = 0
)
""",
)
def url_and_path_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (F6, parse_url built-in), key=value extraction from
    a path (F5), and basename (F8) over synthesized per-doc URLs."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    # coalesce NULL source on BOTH engines so a null row yields a parseable
    # URL instead of engine-specific NULL propagation (NULL-injection sweep)
    src = F.coalesce(F.col("source"), F.lit("unknown"))
    with_url = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), src, F.lit(".example.com/docs/source="),
            src, F.lit("/doc-"), F.col("doc_id").cast("string"),
            F.lit(".txt"),
        ).alias("url"),
    )
    return with_url.select(
        "doc_id",
        parse_url_col("url", "PROTOCOL").alias("protocol"),
        parse_url_col("url", "HOST").alias("host"),
        parse_url_col("url", "PATH").alias("path"),
        hive_partition_value("url", "source").alias("source_param"),
        basename("url").alias("fname"),
    )


@register(
    "array_function_matrix",
    tags=("scalar", "array", "hof"),
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       len(list_filter(embedding, x -> x < 0)) AS n_neg,
       -- list_prepend(0.0, ...) mirrors Spark's F.aggregate initial
       -- accumulator: DuckDB list_reduce has no seed and ERRORS on an
       -- empty list, so a zero-length embedding killed the whole oracle
       -- query where Spark returns 0.0 (review r6); the seeded fold is
       -- also the exact same left-to-right IEEE sum. The NULL guard (r8,
       -- found by the first sweep to inject NULL embeddings): a NULL
       -- list must NULL-propagate like Spark's aggregate, but
       -- list_prepend(0.0, NULL) is [0.0], which the seeded fold turned
       -- into a spurious 0.0.
       CASE WHEN embedding IS NULL THEN NULL ELSE
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))),
                       (a, b) -> a + b) END AS head3_sum,
       CAST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
            AS DOUBLE) AS abs_max,
       CAST(list_sort(embedding)[1] AS DOUBLE) AS smallest,
       CAST(list_reverse(embedding)[1] AS DOUBLE) AS last_elem
FROM embeddings
WHERE vec_id % 20 = 0
""",
)
def array_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array/higher-order-function surface in one projection — size,
    filter-counts, slice+fold, transform(abs)+max, sort, reverse — all
    JVM built-ins over the embeddings array column, each with an exact
    DuckDB list-function twin (float->double widening is exact, so every
    comparison and fold agrees bit-for-bit). Maps/JSON are exercised by
    json_props_rollup; this completes the §2.8 [EXT] array surface."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    v = F.col("embedding")
    dv = F.transform(v, lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.size(F.filter(v, lambda x: x < 0)).alias("n_neg"),
        F.aggregate(
            F.slice(dv, 1, 3), F.lit(0.0), lambda a, b: a + b
        ).alias("head3_sum"),
        F.array_max(F.transform(dv, lambda x: F.abs(x))).alias("abs_max"),
        # try_element_at: ANSI element_at THROWS on an empty array where
        # DuckDB's list[1] yields NULL — align on NULL (review r6; the
        # zero-length-embedding fixture is the trigger)
        F.try_element_at(F.array_sort(v), F.lit(1)).cast("double").alias("smallest"),
        F.try_element_at(F.reverse(v), F.lit(1)).cast("double").alias("last_elem"),
    )


@register(
    "map_function_matrix",
    tags=("scalar", "map", "hof"),
    oracle="""
WITH per AS (
    SELECT user_id, event_type, COUNT(*) AS c
    FROM events WHERE event_type IS NOT NULL
    GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(COALESCE(SUM(c) FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS clicks,
       CAST(COALESCE(SUM(c) FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT) AS purchases,
       CAST(COUNT(*) FILTER (WHERE c >= 3) AS BIGINT) AS frequent_types,
       CAST(SUM(c) AS BIGINT) AS total_events
FROM per GROUP BY user_id
""",
)
def map_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MapType surface (§2.8 EXT) in one projection: per user, an
    event_type -> count map built with map_from_entries(collect_list),
    then size, element_at lookups (NULL -> 0 via coalesce), map_filter
    (types seen >= 3 times) and a map_values fold. collect_list order is
    nondeterministic, but every extraction here is key-based or
    order-insensitive, so the result is deterministic — the oracle computes
    the same answers relationally (DuckDB's MAP is a different-enough type
    that value-level parity, not map-literal parity, is the check that
    makes sense). Plan: one (user, type) groupBy, one user groupBy — the
    map lives entirely inside the second aggregate's projection."""
    ev = t(spark, sf_dir, "events")
    # NULL event_type cannot be a map key (Spark raises NULL_MAP_KEY);
    # exclude it on BOTH engines — found by the NULL-injection sweep
    per = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .count()
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "count"))
        ).alias("m")
    )
    zero = F.lit(0).cast("long")
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.coalesce(F.element_at("m", F.lit("click")), zero).alias("clicks"),
        F.coalesce(F.element_at("m", F.lit("purchase")), zero).alias("purchases"),
        F.size(F.map_filter("m", lambda k, v: v >= 3)).cast("long").alias(
            "frequent_types"
        ),
        F.aggregate(F.map_values("m"), zero, lambda a, x: a + x).alias(
            "total_events"
        ),
    )
