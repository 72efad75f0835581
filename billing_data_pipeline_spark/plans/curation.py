"""[EXT] Corpus-curation catalog queries (SURVEY.md §2.12 family): PII
scrubbing, segment-level dedup, benchmark decontamination, token-budget
mixing — all fully hash-checked against DuckDB oracles.

The documents testdata is clean word-soup (no emails/digits), so the PII
query injects deterministic PII spans derived from doc_id IDENTICALLY in
both engines before scrubbing — the scrub chain itself is what's under
test, end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as C
from ..operators import dedup as D
from ..operators import sampling as SMP
from ..operators import text as X
from ..registry import register
from ._util import t

# Deterministic PII injection (same expression both engines):
#   '<text> contact user<id>@mail.example.com from 10.<id%200>.0.<id*7%200>
#    call 555-<id%10000 zero-padded>'
_INJECT_SQL = (
    "text || ' contact user' || doc_id || '@mail.example.com'"
    " || ' from 10.' || (doc_id % 200) || '.0.' || ((doc_id * 7) % 200)"
    " || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _injected(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@mail.example.com"),
            F.lit(" from 10."),
            (d % 200).cast("string"),
            F.lit(".0."),
            ((d * 7) % 200).cast("string"),
            F.lit(" call 555-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )


@register(
    "pii_scrub_docs",
    tags=("ext", "curation", "text"),
    bench=True,
    oracle=C.scrub_pii_sql("documents", "doc_id", f"({_INJECT_SQL})"),
)
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the documents corpus (emails / IPv4s / phone
    spans -> typed redaction tokens, per-type hit counts). Pure
    regexp_count/regexp_replace chain: shuffle-free, whole-stage codegen,
    scales with the scan."""
    return C.scrub_pii(_injected(t(spark, sf_dir, "documents")), "doc_id", "text")


@register(
    "segment_dedup_docs",
    tags=("ext", "curation", "dedup"),
    bench=True,
    oracle=C.segment_dedup_sql("documents", "doc_id", "text", 10),
)
def segment_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level (paragraph-style) corpus dedup: 10-token segments,
    global keep-first by (doc_id, idx), reassembled clean text. One
    segment-hash window + one per-doc groupBy."""
    return C.segment_dedup(t(spark, sf_dir, "documents"), "doc_id", "text", seg=10)


@register(
    "boilerplate_strip_docs",
    tags=("ext", "curation", "dedup"),
    oracle=C.boilerplate_strip_sql("documents", "doc_id", "text", 10, 1),
)
def boilerplate_strip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal: 10-token segments whose corpus
    document-frequency exceeds 1 are stripped from EVERY document
    (segment_dedup keeps one canonical copy; this keeps none). Map-side
    pre-aggregated doc-frequency — no unsplittable hot-segment window."""
    return C.boilerplate_strip(
        t(spark, sf_dir, "documents"), "doc_id", "text", seg=10, max_df=1
    )


_DECON_N = 5


@register(
    "decontaminate_ngram",
    tags=("ext", "curation", "dedup"),
    bench=True,
    oracle=f"""
WITH ev AS (SELECT * FROM documents WHERE doc_id % 20 = 0),
tr AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
evg AS (SELECT DISTINCT ngram
        FROM ({C.ngrams_sql('ev', 'doc_id', 'text', _DECON_N)})),
trg AS ({C.ngrams_sql('tr', 'doc_id', 'text', _DECON_N)}),
hits AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM trg JOIN evg USING (ngram)
    GROUP BY doc_id
)
SELECT tr.doc_id,
       COALESCE(n, 0) AS n_hit_ngrams,
       COALESCE(n, 0) > 0 AS contaminated
FROM tr LEFT JOIN hits USING (doc_id)
""",
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    5-gram with the held-out eval slice (doc_id % 20 == 0). The eval
    n-gram set is broadcast — the train corpus is never shuffled."""
    docs = t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)
    return C.decontaminate(tr, ev, "doc_id", "text", n=_DECON_N)


# the bloom tier is EXACT (prefilter + string-join confirm), so it rides
# the identical oracle as the set tier above
_DECON_ORACLE = f"""
WITH ev AS (SELECT * FROM documents WHERE doc_id % 20 = 0),
tr AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
evg AS (SELECT DISTINCT ngram
        FROM ({C.ngrams_sql('ev', 'doc_id', 'text', _DECON_N)})),
trg AS ({C.ngrams_sql('tr', 'doc_id', 'text', _DECON_N)}),
hits AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM trg JOIN evg USING (ngram)
    GROUP BY doc_id
)
SELECT tr.doc_id,
       COALESCE(n, 0) AS n_hit_ngrams,
       COALESCE(n, 0) > 0 AS contaminated
FROM tr LEFT JOIN hits USING (doc_id)
"""


@register(
    "decontaminate_ngram_bloom",
    tags=("ext", "curation", "dedup", "bloom"),
    oracle=_DECON_ORACLE,
)
def decontaminate_ngram_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefilter decontamination (r10) — same flags as
    decontaminate_ngram through the giant-eval-set scale path: eval
    grams collect as xxhash64 int64s (8 B/gram vs the set tier's Python
    strings), a numpy Bloom bit array ships per executor, one
    exchange-free corpus probe emits only surviving rows, and an exact
    string join removes Bloom false positives — EXACT output (no false
    negatives exist), so this tier is value-hash checked against the
    identical oracle as the set tier."""
    docs = t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)
    return C.decontaminate_bloom(tr, ev, "doc_id", "text", n=_DECON_N)


@register(
    "epoch_shard_manifest",
    tags=("ext", "curation", "sampling", "layout"),
    oracle=C.epoch_shard_manifest_sql(
        "documents",
        "source",
        "doc_id",
        X.token_count_sql("text"),
        "(COALESCE(TRY_CAST(substr(source, 4) AS BIGINT) % 3, 0)) + 1",
        n_shards=8,
    ),
)
def epoch_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch upsampling + deterministic shard assignment: each source's
    docs repeat 1-3 times (epoch weight from the source id), every (doc,
    epoch) replica lands in one of 8 shards by mixed hash; per-shard
    manifest. The write path repartitions on the same shard column — one
    exchange, reproducible training order."""
    docs = t(spark, sf_dir, "documents")
    return C.epoch_shard_manifest(
        docs,
        "source",
        "doc_id",
        X.token_count(F.col("text")),
        # try_cast + default weight 1 (r9, --giantdoc sweep): the srcNN
        # parse is testdata-shaped, but a lake WILL carry other labels —
        # source='giant' made ANSI CAST (and DuckDB's strict CAST) kill
        # BOTH engines. Contract: unparseable source id => epoch weight 1.
        (F.coalesce(
            F.expr("TRY_CAST(substring(source, 4) AS BIGINT)") % 3,
            F.lit(0),
        )) + 1,
        n_shards=8,
    )


@register(
    "repeated_ngram_stats",
    tags=("ext", "curation", "dedup", "stats"),
    oracle=C.repeated_ngram_stats_sql("documents", "doc_id", "text", 8),
)
def repeated_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-span analysis: per doc, how many of its
    distinct word 8-grams occur in >= 2 documents, and the shared
    fraction — the corpus statistic behind substring-dedup decisions.
    Grams dedup inside the row; only gram/count rows shuffle."""
    return C.repeated_ngram_stats(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=8
    )


@register(
    "dataset_split_summary",
    tags=("ext", "curation", "sampling"),
    oracle=f"""
SELECT source,
       {SMP.assign_split_sql('doc_id')} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({X.token_count_sql('text')}) AS BIGINT)
           AS n_tokens
FROM documents
GROUP BY 1, 2
""",
)
def dataset_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5 mixer cut) rolled
    up per (source, split). The split label is a scan-side expression —
    no shuffle beyond the summary groupBy — and a doc's split never
    changes across incremental re-curations (no train/test leakage)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", SMP.assign_split(F.col("doc_id")))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(X.token_count(F.col("text")).cast("bigint")).alias("n_tokens"),
        )
    )


_NORM_SQL = D.normalized_text_sql("text")  # shared builder (review r5)


@register(
    "leakage_safe_split_summary",
    tags=("ext", "curation", "sampling", "dedup"),
    oracle=f"""
WITH keyed AS (
    SELECT *, ('0x' || substr(md5({_NORM_SQL}), 1, 15))::BIGINT AS grp
    FROM documents
)
SELECT {SMP.assign_split_sql('grp')} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
       CAST(SUM({X.token_count_sql('text')}) AS BIGINT)
           AS n_tokens
FROM keyed
GROUP BY 1
""",
)
def leakage_safe_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split assignment keyed on the NORMALIZED-CONTENT hash, not the doc
    id: near-identical copies straddling train/test are themselves
    leakage, so every member of a duplicate group inherits the same split
    by construction (no dedup pass required first). Portable 60-bit
    md5-derived key feeds the same mixer cut as dataset_split_summary;
    summary per split counts docs vs distinct duplicate groups."""
    from ..operators import portable_dedup as PD

    docs = t(spark, sf_dir, "documents")
    grp = PD.portable_hash60(D.normalized_text("text"))
    return (
        docs.withColumn("grp", grp)
        .withColumn("split", SMP.assign_split(F.col("grp")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("grp").cast("bigint").alias("n_groups"),
            F.sum(X.token_count(F.col("text")).cast("bigint")).alias("n_tokens"),
        )
    )


# NOTE: parenthesization differs cosmetically from the old inline form
# ((A/L) - (B/L) vs (A/L - B/L)) — same operator precedence, same doubles;
# the builder next to the Spark expression is the single source (review r5)
_QUALITY_SQL = X.quality_score_sql("clean_text")


_STREAM_CURATION_ORACLE = f"""
WITH scrubbed AS (
{C.scrub_pii_sql("documents", "doc_id", f"({_INJECT_SQL})")}
)
SELECT doc_id, n_emails, n_ips, n_phones,
       CAST({X.token_count_sql("clean_text")} AS INT) AS n_tokens
FROM scrubbed
WHERE length(clean_text) > 0 AND {_QUALITY_SQL} > 0.05
"""


@register(
    "streaming_curation_catchup",
    tags=("ext", "curation", "streaming", "true-stream"),
    oracle=_STREAM_CURATION_ORACLE,
)
def streaming_curation_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-stream curation: the documents table replayed through a
    file-source stream, PII-scrubbed (same injected spans as
    pii_scrub_docs) and quality-filtered per micro-batch — stateless
    transformations, so append mode needs no watermark and no state store.
    Drained with AvailableNow and hash-checked against the batch SQL: the
    batch/stream unification claim, proven on the curation surface."""
    from .._names import uid_name

    from ..streaming.event_windows import run_to_memory
    from .streaming_queries import _deliver, _stream_scratch_dir

    # swept registry, not a bare mkdtemp (review r5: one leaked delivery
    # dir per invocation across bench's min-of-N loops and test runs)
    d = _stream_scratch_dir("docs_stream_")
    # _deliver links single-file AND Spark-written directory tables alike
    # (review r4: a bare symlink of a dir-shaped documents.parquet listed
    # zero files and drained empty — the same trap already fixed for the
    # event streams)
    _deliver(f"{sf_dir}/documents.parquet", d, "documents")
    sdf = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(d)
    scrubbed = C.scrub_pii(_injected(sdf), "doc_id", "text")
    out = scrubbed.filter(
        (F.length("clean_text") > 0)
        & (X.quality_score(F.col("clean_text")) > 0.05)
    ).select(
        "doc_id",
        "n_emails",
        "n_ips",
        "n_phones",
        X.token_count(F.col("clean_text")).cast("int").alias("n_tokens"),
    )
    return run_to_memory(out, uid_name("cur"), "append")


@register(
    "corpus_mix_budget",
    tags=("ext", "curation", "sampling"),
    oracle=C.mix_to_budget_sql(
        "documents",
        "source",
        "doc_id",
        X.token_count_sql("text"),
        "(COALESCE(TRY_CAST(substr(source, 4) AS BIGINT) % 3, 0)) + 1",
    ),
)
def corpus_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: per-source weights (derived
    deterministically from the source id), half the corpus's tokens as the
    global budget, greedy keep in mixed-hash order. Per-source summary."""
    docs = t(spark, sf_dir, "documents")
    return C.mix_to_budget(
        docs,
        "source",
        "doc_id",
        X.token_count(F.col("text")),
        # try_cast + default weight 1 (r9, --giantdoc sweep): the srcNN
        # parse is testdata-shaped, but a lake WILL carry other labels —
        # source='giant' made ANSI CAST (and DuckDB's strict CAST) kill
        # BOTH engines. Contract: unparseable source id => epoch weight 1.
        (F.coalesce(
            F.expr("TRY_CAST(substring(source, 4) AS BIGINT)") % 3,
            F.lit(0),
        )) + 1,
    )


@register(
    "quality_quantile_filter",
    tags=("ext", "curation", "quality", "quantile"),
    oracle=f"""
WITH scored AS (
    SELECT doc_id, lang, {X.model_quality_score_sql("text")} AS score
    FROM documents
),
ranked AS (
    SELECT doc_id, lang, score,
           row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC)
               AS rnk,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM scored
)
SELECT doc_id, lang, score FROM ranked WHERE rnk * 4 <= n
""",
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top quality QUARTILE per language — quantile-relative corpus
    filtering (the "take the best X% of each language" curation op, which a
    fixed threshold can't express because score distributions differ per
    language). The cut is pure integer rank arithmetic (rnk * 4 <= n), not
    percent_rank's n=1-edge-cased float division — deterministic for any
    group size on any engine.

    Scale shape: one window over the (lang | score, doc_id) partitioning —
    the same exchange a groupBy(lang) would make; the count-over is computed
    in the same window pass. Per-lang skew is bounded by the corpus's
    language mix; for a mega-language, cut on approx_percentile cutpoints
    instead (the event_value_deciles_scalable pattern)."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", X.model_quality_score(F.col("text")).alias("score")
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    wn = Window.partitionBy("lang")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("rnk") * 4 <= F.col("n"))
        .select("doc_id", "lang", "score")
    )
