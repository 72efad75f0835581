"""Query catalog: the single registry behind ``__spark_entry__`` and bench.

Every operator from SURVEY.md §2 registers here as a named query — a
callable ``(spark, sf_dir) -> DataFrame`` — optionally paired with an ANSI
SQL oracle string that DuckDB can run on the same parquet views. The driver
compares Spark vs oracle (row count + schema + order-insensitive value
hash), so:

- every computed column is explicitly aliased identically on both sides,
- floating aggregates are rounded (ROUND(x, 4)) on both sides so summation
  order (Spark partial aggregation vs DuckDB) can't flip the hash,
- integer sums are CAST to BIGINT in the oracle (DuckDB sums INTEGER into
  HUGEINT; Spark sums into LONG),
- top-k queries carry a deterministic tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None => driver records rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline run
    # DuckDB SQL bench.py times INSTEAD of `oracle` when the correctness
    # oracle deliberately runs a DIFFERENT algorithm than the Spark side
    # (e.g. incremental_status_rollup_cdc's oracle is a full recompute to
    # PROVE the maintenance algebra, while the query performs incremental
    # maintenance — timing recompute vs maintenance compares algorithms,
    # not engines). Must produce the identical result set as `oracle`
    # (asserted in tests) so the co-measure stays an honest same-task run.
    bench_baseline_sql: str | None = None
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    bench_baseline_sql: str | None = None,
):
    """Decorator registering a query into the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tuple(tags),
            bench=bench,
            bench_baseline_sql=bench_baseline_sql,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


# The external correctness gate samples the first N (observed: 50) catalog
# entries in registration order. Rotation policy (VERDICT r3 #3): 15 slots
# stay PINNED — one flagship per §2 / §2.12 family — plus any operator whose
# implementation changed in the current round; the remaining slots ROTATE
# over catalog queries by external-coverage staleness. After the r5
# rotation 157/165 had an external driver row; the r6 list below includes
# the final 8 never-checked queries (5 oracle-backed + 3 rows-only — the
# rows-only trio gets the driver's weaker rows-only check, which is still
# its first external run), closing full-catalog external coverage. Names
# must exist; all but the documented rows-only trio must carry an oracle
# (asserted in tests).
DRIVER_SAMPLE_PRIORITY: tuple[str, ...] = (
    # --- pinned flagships (one per family; r1-r5 green driver rows) ---
    "daily_aggregates",  # reference-core aggregate
    "dedup_anti_join",  # ingest anti-join
    "scalar_function_matrix",  # scalar surface
    "user_sessions",  # windows
    "returnflag_multiset_ops",  # set ops
    "incremental_status_rollup_cdc",  # snapshots / CDC
    "token_runs_udtf",  # UDF surface
    "streaming_tumbling_catchup",  # TRUE stream
    "shipping_priority",  # TPC-H joins
    "purchase_last_click_asof",  # temporal as-of
    "exact_dedup_docs",  # exact dedup
    "minhash_neardup_pairs_portable",  # LSH near-dup
    "embedding_ivf_topk",  # ANN
    "text_quality_by_lang",  # text analysis
    "media_real_decode_manifest",  # multimodal
    # --- r8 implementation-changed re-pins (policy: any query whose
    # call graph changed in the round rides the external sample that
    # round). The r8 unhint pass (VERDICT r7 #1) touched every broadcast
    # site below; the r7 pins they evict all rode r7 green. ---
    # --- r9 giant-doc contract pass (oracle rewrites: list slices ->
    # element accesses in every chunk/ngram oracle, plus the
    # unparseable-source-id containment — 7 pins below; they evict the
    # remaining r8 unhint pins (top_regions_by_usage,
    # late_shipment_priority, small_quantity_part_revenue,
    # promo_revenue_share, part_supplier_variety), date_spine_coverage,
    # and daily_value_ohlc — every one rode r8 green and is unchanged
    # this round. chunk_documents / decontaminate_ngram also changed and
    # were already pinned. ---
    "packed_chunk_bins",  # r9: slice-free pack oracle chunks CTE
    "repeated_ngram_stats",  # r9: slice-free ngrams_sql
    "segment_dedup_docs",  # r9: via chunk_tokens_oracle_sql
    # (boilerplate_strip_docs evicted r12 — rode r9/r10/r11 green,
    #  unchanged; the chunk_tokens oracle family keeps chunk_documents,
    #  segment_dedup_docs, packed_chunk_bins and training_corpus_pipeline
    #  as riders — for the sliding/tumbling standing rider below)
    "training_corpus_pipeline",  # r9: inline chunks CTE rewritten
    # (corpus_mix_budget evicted r11 — rode r9/r10 green, unchanged —
    #  for the construction-pass re-pins below)
    # --- r9 badjson contract pass (all three JSON tiers changed: try_*
    # containment Spark-side, TRY_CAST(props AS JSON) in the shared
    # oracle — evicting nation_market_share / product_profit_by_nation /
    # returned_revenue_customers, which rode r8 green and are unchanged
    # this round) ---
    # --- r11 optimization pass re-pin (policy: plan changed this round):
    # the Q4-shape dedup rewrite (dropDuplicates-then-count ->
    # count(DISTINCT o_orderkey), commit bda2cb4) changed
    # late_shipment_priority's analyzed plan; it must ride the r11
    # external sample. Evicts json_props_rollup (r9 try_cast pin — rode
    # r9 AND r10 green, unchanged this round). ---
    "late_shipment_priority",  # r11: single-distinct Q4 dedup rewrite
    # --- r11 optimization pass re-pin #2: service_aggregates' analyzed
    # plan gained the widen_scan fan_out (low-group-cardinality single-
    # distinct tier, operators/aggregates.py). Evicts
    # error_burst_range_join (r8 NULL-id oracle pin — rode r8/r9/r10
    # green, Spark side and oracle unchanged since). ---
    "service_aggregates",  # r11: widen_scan fan_out on the 6-group tier
    # --- r11 construction-overhead pass re-pins (the selectExpr/expr
    # rewrites change analyzed-plan text — lambda variable names,
    # Project/Filter order — while computing identical results; every
    # changed query must ride the r11 sample). Most affected queries
    # are already pinned above or ride in catalog order; the two below
    # were not. Evicts embedding_neardup_pairs (r5/r6 pins — rode
    # r7-r10 green, unchanged this round; the embedding family keeps
    # cosine/pq/lsh/dedup riders) and corpus_mix_budget (r9 TRY_CAST
    # pin — rode r9/r10 green, unchanged this round).
    # minhash_neardup_pairs (fast tier) also changed but is rows-only
    # and not sample-allowed (the r9 matmul / r10 cap-pass precedent);
    # its oracle-checked siblings minhash_neardup_pairs_portable,
    # ngram_jaccard_pairs and incremental_neardup_vs_corpus share every
    # changed code path (_cap_blocks, minhash_agreement_est, _band_keys)
    # and ride. ---
    "order_snapshot_diff",  # r11: _diff_keyed selectExpr rewrite
    "incremental_neardup_vs_corpus",  # r11: _band_keys/_cap_blocks rewrite
    # --- r10 degenerate-block cap pass (VERDICT r9 item 2: the three
    # blocked near-dup tiers gained frequency caps, oracle-replayed;
    # editdist_neardup_pairs was already pinned; the two new overflow
    # companions are new-since-manifest so they must ride; evicting
    # variant_props_rollup / json_props_typed_rollup /
    # epoch_shard_manifest — each rode r9 green and is unchanged r10.
    # minhash_neardup_pairs also changed but is rows-only and not
    # sample-allowed (the r9 matmul precedent); its capped oracle-checked
    # siblings ride. ---
    "ngram_jaccard_pairs",  # r10: shingle_cap in plan + oracle
    "editdist_block_overflow",  # r10: new no-silent-truncation surface
    "shingle_posting_overflow",  # r10: new no-silent-truncation surface
    # --- r9: new operator (Levenshtein record-linkage tier; evicts
    # dominant_part_suppliers, which rode r8 green and is unchanged) ---
    "editdist_neardup_pairs",  # r10: block_cap in plan + oracle
    # --- r9 geometry-contract pass (ragged-dimension sweep: every
    # similarity tier gained a plan-side size(embedding)=dim filter and
    # its oracle the matching len() clause — 10 queries changed; the
    # seven embedding_* flagships/standing pins below already ride.
    # disjunctive_part_revenue + large_order_customers evicted (rode r8
    # green, unchanged r9). embedding_matmul_topk also changed but is
    # rows-only and not sample-allowed; its bit-exact twin
    # embedding_cosine_topk rides, same style as the r8 asof note. ---
    "embedding_dedup_survivors",  # r9: geometry filter + oracle len()
    # (embedding_dedup_components evicted r12 — rode r9/r10/r11 green,
    #  unchanged this round, and its changed-path coverage
    #  (cosine_neardup_pairs) is duplicated by the still-riding
    #  embedding_dedup_survivors — for the region_aggregates re-pin
    #  below) ---
    # --- r12 optimization pass re-pin (policy: plan changed this round):
    # the grouped_profile k>=2 tier now evaluates the measure and the
    # condition CASEs map-side as narrow projected columns before the
    # group-key exchange (operators/aggregates.py), which changes the
    # analyzed plans of every k>=2 caller: daily_aggregates (rides
    # above, also regrouped by raw l_shipdate with the calendar split
    # post-aggregate) and region_aggregates (pinned here).
    # daily_aggregates_hll also changed (same date-key regroup) but is
    # rows-only and not sample-allowed (the r9 matmul / r10 cap-pass
    # precedent); its oracle-checked sibling daily_aggregates shares
    # both changed code paths and rides. ---
    "region_aggregates",  # r12: k>=2 narrow-shuffle + broadcast-join dims
    # (embedding_lsh_topk evicted r10 — rode r9 green, unchanged — for
    #  the new bloom decontamination tier, which must ride as a new
    #  oracle-backed query)
    "decontaminate_ngram_bloom",  # r10: NEW exact bloom-prefilter tier
    # (embedding_ivf_topk rides as a flagship; its probe join was
    #  unhinted in the same pass)
    # --- r7->r8 pin-policy close-out (ADVICE r7: changed in 5c9962f but
    # missed the r7 sample) ---
    "chunk_documents",  # 5c9962f: ws_tokens consolidation
    # --- rows-only entries (documented in CATALOG.md) ---
    "event_value_deciles_scalable",  # rows-only (approx cutpoints)
    "incremental_rollup_merge",  # rows-only (sketch merge)
    "usage_percentiles_approx",  # rows-only (approx_percentile)
    "ml_minhash_neardup_pairs",  # rows-only; r6 persist-barrier rework
    # --- standing re-pins for load-bearing reworked tiers (r8 evicted
    # heavy_hitter_terms, user_state_scd2, embedding_kmeans_fit2 — each
    # rode r6/r7 green and is unchanged this round; kmeans_step stays as
    # the family representative — for the NULL-key contract pins below) ---
    "usage_percentiles",  # r5 interpolation; r7 sketch-bracket tier + dispatch
    "doc_top_terms_tfidf",  # r6/r7 reworks; r8 int32-slot chunked packing
    "decontaminate_ngram",  # r6 perf rework; r8 A/B target (VERDICT #2)
    "embedding_kmeans_step",  # r7: NULL/short-vector exclusion both engines
    # --- r8 NULL-KEY contract pass (NULL user_id / event_id in events;
    # streaming + oracle-text changes are fingerprint-blind, discipline) ---
    "streaming_stateful_totals",  # r8: nullable group key (stream crashed)
    # (error_burst_range_join evicted r11 — rode r8/r9/r10 green,
    #  unchanged — for the service_aggregates widen_scan re-pin)
    "embedding_cosine_topk",  # r5: zero-norm try_divide semantics
    # (embedding_neardup_pairs evicted r11 — rode r7-r10 green,
    #  unchanged — for the construction-pass re-pins above)
    "embedding_pq_topk",  # r7 NULL-vec guards; r8 documented ADC exception
    "decontaminate_embedding",  # r7: NULL-vec crash guards
    # --- r8 NULL-embedding contract pass (oracle IS NOT NULL + rerank
    # kernel pd.notna fix; plan fingerprints can't see oracle text or
    # kernel bodies, so these ride by discipline) ---
    "embedding_lsh_neardup_pairs",  # r8: _cosine_rerank NaN-norm fix
    # --- r8 NULL-event-time contract pass (streaming plans are the
    # fingerprint blind spot — foreachBatch/memory-sink internals never
    # reach the analyzed plan — so every member rides by discipline).
    # The whole staleness-refresh rotation (doc_repetition_stats,
    # order_snapshot_diff, udaf_median_event_value) plus
    # embedding_dedup_survivors (oracle edit provably semantics-free:
    # NULL-vec rows never pair, and its pair subquery rides via the
    # pinned embedding_neardup_pairs) were evicted for these. Not
    # pinned: purchase_last_click_asof_cogroup (Spark side unchanged;
    # its oracle IS the shared _ASOF_ORACLE riding via the pinned
    # purchase_last_click_asof) and streaming_sliding_catchup /
    # tumbling_event_counts (same one-line ts-IS-NOT-NULL oracle edit as
    # the three sliding/tumbling representatives that rode r8–r10;
    # NOTE r11: those three representatives — session_window_stats,
    # sliding_window_volume, streaming_ohlc_catchup — were evicted for
    # the BPE pins after riding r10 green; any future change to the
    # sliding/tumbling oracle family must re-pin members itself, the
    # family no longer has a standing rider). ---
    "streaming_dedup_catchup",  # r9: TZ-stable key_json (kernel changed)
    # --- r12: standing sliding/tumbling-family rider (VERDICT r11 item 7:
    # after the r11 rotation the family's shared ts-IS-NOT-NULL oracle
    # text had NO sample member — any edit to it would ship unverified).
    # sliding_window_volume represents the family (session_window_stats /
    # streaming_ohlc_catchup / streaming_sliding_catchup /
    # tumbling_event_counts share the oracle conventions). ---
    "sliding_window_volume",  # r12: standing rider for the window family
    # --- r11: new BPE tokenizer tier (VERDICT r10 item 4) — three new
    # oracle-backed queries must ride; evicting session_window_stats /
    # sliding_window_volume / streaming_ohlc_catchup (r8 discipline pins
    # — each rode r10 green and is unchanged this round; the streaming
    # family keeps streaming_tumbling_catchup, streaming_stateful_totals
    # and streaming_dedup_catchup as riders). ---
    "chunk_documents_bpe",  # r11: NEW literal-merge-table BPE chunking
    "packed_chunk_bins_bpe",  # r11: NEW BPE-budget greedy packing
    "doc_bpe_token_stats",  # r11: NEW per-doc real-tokenizer counts
    # --- r9: new query (bench-flag carrier for the token-runs family;
    # evicts array_function_matrix, which rode r8 green and is
    # unchanged this round) ---
    "token_runs_builtin",
)

#: The only rows-only (no-oracle) names allowed in the driver sample — the
#: three never-externally-checked sketch tiers (r6) plus the r6-changed
#: ml persist-barrier variant. Everything else in the sample must be
#: value-hash checkable.
ROWS_ONLY_SAMPLE_ALLOWED: frozenset[str] = frozenset(
    {
        "event_value_deciles_scalable",
        "incremental_rollup_merge",
        "usage_percentiles_approx",
        "ml_minhash_neardup_pairs",
    }
)


def load_catalog() -> dict[str, QuerySpec]:
    """Import all plan modules (side effect: they register) and return the
    catalog, priority entries first (driver-sample ordering)."""
    from .plans import (  # noqa: F401
        billing,
        curation,
        extensions,
        ml,
        relational,
        scalar_queries,
        sql_api,
        stats,
        streaming_queries,
        temporal_joins,
        timeseries,
        tpch_extra,
    )

    ordered = {name: QUERIES[name] for name in DRIVER_SAMPLE_PRIORITY}
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
