"""The declared query inventory: every entry pairs a Spark DataFrame plan
with the ANSI-SQL DuckDB oracle the driver replays at sf0.01.

Conventions (driver contract, __spark_entry__.py):
* every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before value-hashing);
* floating-point outputs that pass through an aggregation are rounded so
  summation-order differences between engines cannot flip the hash
  (money sums to their exact decimal width, ratios/similarities to 6);
* timestamps are emitted as formatted strings (engine-neutral).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    run: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, run=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The round driver oracle-checks only the FIRST 50 registry entries, so the
# inventory order is a verification-priority list, not an aesthetic one.
# Steady state for 126 queries / 50 slots: every entry gets a driver row at
# least every ~2.3 rounds; new or changed queries always re-enter the window
# immediately, then the longest-stale class fills the remainder.
_DRIVER_WINDOW = [
    # Round-5 rotation (VERDICT r4 item 1). (a) new or changed this round:
    # event_quantile_sketch is new (the deterministic mergeable quantile
    # sketch, VERDICT item 2); kmv_distinct_users' oracle gained the NULL
    # filter; doc_lm_score / doc_dsir_selection / doc_curation_decision
    # share the bigram-model cache-release rework; event_value_percentiles
    # is doc-only (small-group-only scale note) but rides along.
    "event_quantile_sketch",
    "kmv_distinct_users",
    "doc_lm_score",
    "doc_dsir_selection",
    "doc_curation_decision",
    "event_value_percentiles",
    # (a cont.) similarity_graph_ann is new in r5 (HNSW-style graph ANN);
    # inline_ref_parse is displaced to the round-6 leads to hold 50.
    "similarity_graph_ann",
    # (a cont.) doc_length_quantiles is new in r5 (the quantile sketch as
    # an ANALYZE surface); dedup_cluster_components displaced to r6 leads.
    "doc_length_quantiles",
    # (a cont.) graph_nn_descent_stats is new in r5 (NN-descent round —
    # the probe-flagged build's linear-per-round refinement path);
    # doc_stratified_sample displaced to the round-6 leads.
    "graph_nn_descent_stats",
    # (a cont.) the theta-sketch set-op pair is new in r5 (pairwise
    # segment overlap estimates from bottom-k sketches);
    # pack_utilization / doc_mixture_report displaced to the r6 leads.
    "event_audience_overlap",
    "lang_shingle_overlap",
    # (a cont.) join_skew_profile is new in r5 (pre-join cardinality /
    # skew advisory); reverse_invalidation displaced to the r6 leads.
    "join_skew_profile",
    # (a cont.) doc_rag_chunks is new in r5 (token-window RAG chunking);
    # outbox_dedup_append displaced to the r6 leads.
    "doc_rag_chunks",
    # (a cont.) events_zorder_layout is new in r5 (Morton clustering
    # audit); streaming_event_window_counts displaced to the r6 leads.
    "events_zorder_layout",
    # (a cont.) similarity_binary_topk is new in r5 (binary sign
    # quantization ANN); similarity_lsh_ann displaced to the r6 leads.
    "similarity_binary_topk",
    # (a cont.) event_funnel_conversion is new in r5 (windowed ordered
    # funnel); similarity_cosine_topk displaced to the r6 leads.
    "event_funnel_conversion",
    # (a cont.) event_retention_cohorts is new in r5 (weekly cohort
    # retention); event_range_join displaced to the r6 leads.
    "event_retention_cohorts",
    # (a cont.) event_rate_anomalies is new in r5 (integer-exact
    # trailing z-score flags); event_asof_attribution displaced to the
    # r6 leads.
    "event_rate_anomalies",
    # (a cont.) similarity_multiprobe_lsh is new in r5 (1-bit-flip
    # probe fanout); url_build_redact displaced to the r6 leads.
    "similarity_multiprobe_lsh",
    # (a cont.) similarity_margin_probe_lsh is new in r5 (Lv'07
    # query-directed probing); place_crawl_closure displaced to the
    # r6 leads.
    "similarity_margin_probe_lsh",
    # (a cont.) similarity_ivfpq_residual_topk is new in r5 (Jegou'11
    # IVFADC with cell-mean residuals); streaming_stateful_sessions
    # displaced to the r6 leads.
    "similarity_ivfpq_residual_topk",
    # (a cont.) doc_bm25_topk is new in r5 (BM25 lexical ranking);
    # similarity_pq_refined_topk displaced to the r6 leads.
    "doc_bm25_topk",
    # (a cont.) doc_hybrid_rrf_topk is new in r5 (lexical+vector RRF
    # fusion); similarity_pq_adc_topk displaced to the r6 leads.
    "doc_hybrid_rrf_topk",
    # (a cont.) similarity_ivfpq_refined_topk is new in r5 (full
    # IVFADC); similarity_quantized_topk displaced to the r6 leads.
    "similarity_ivfpq_refined_topk",
    # (b) every query whose last driver-green row is round 2 — the full
    # 22-entry stale set (the 17 enumerated in the r4 NOTES roadmap plus
    # the 5 relational/outbox entries displaced with them), longest-stale
    # class first per the rotation scheme.
    "event_sessions",
    "order_rollup",
    "cheapest_supplier_per_part",
    "pricing_summary",
    "status_counts",
    "key_roundtrip",
    "orders_per_customer_list",
    "event_journey",
    "dedup_minhash_lsh",
    "positional_list_parse",
    "recent_event_stats",
    "code_first_id_wins",
    "name_fallback_resolution",
    "active_entity_keys",
    "sync_diff_classify",
    "top3_orders_per_segment",
    "revenue_by_nation",
    "orders_with_returns",
    "customers_without_orders",
    "customer_any_return",
    "outbox_drain_cap",
    "global_cursors",
    # (c) round-3-green block, oldest remaining class, filling the window
    # to exactly 50. The 13 r3 entries that do not fit lead round 6.
    "doc_quota_sample",
    "similarity_ivf_ann",
    # (a cont.) the BPE pair also changed this round: train_merges gained
    # the driver-collect bound guard (VERDICT r4 item 6), so both queries
    # re-enter the window; doc_char_entropy / search_index_config are
    # displaced to the round-6 leads to keep the window at exactly 50.
    "bpe_train_merges",
    "bpe_encode_stats",
    # ---- driver window boundary: only the FIRST 50 entries above get a
    # driver row this round. Below: the 33 r3-green entries that did not
    # fit (13 never rotated in plus doc_stratified_sample /
    # dedup_cluster_components / inline_ref_parse / doc_char_entropy /
    # search_index_config / pack_utilization / doc_mixture_report /
    # reverse_invalidation / outbox_dedup_append /
    # streaming_event_window_counts / similarity_lsh_ann /
    # similarity_cosine_topk / event_range_join /
    # event_asof_attribution / url_build_redact / place_crawl_closure /
    # streaming_stateful_sessions / similarity_pq_refined_topk /
    # similarity_pq_adc_topk / similarity_quantized_topk, each displaced
    # by an r5 addition); they lead
    # the round-6 window, then come the round-4-green block —
    # all unchanged since their last green row and re-pinned every session
    # by tests/test_oracle_parity.py, which replays ALL entries. ----
    "doc_stratified_sample",
    "dedup_cluster_components",
    "inline_ref_parse",
    "doc_char_entropy",
    "search_index_config",
    "pack_utilization",
    "doc_mixture_report",
    "reverse_invalidation",
    "outbox_dedup_append",
    "streaming_event_window_counts",
    "similarity_lsh_ann",
    "similarity_cosine_topk",
    "event_range_join",
    "event_asof_attribution",
    "url_build_redact",
    "place_crawl_closure",
    "streaming_stateful_sessions",
    "similarity_pq_refined_topk",
    "similarity_pq_adc_topk",
    "similarity_quantized_topk",
    "similarity_pq_kmeans_topk",
    "doc_cdc_chunks",
    "dedup_translit_shingles",
    "doc_gopher_rules",
    "doc_split_assign",
    "doc_cdc_chunks_clamped",
    "hll_distinct_users",
    "inverted_index_postings",
    "streaming_view_purchase_join",
    "similarity_opq_kmeans_topk",
    "streaming_dedup_keys",
    "dedup_pagerank_centrality",
    "documents_profile",
    # round-4-green (unchanged since CORRECTNESS_r04)
    "doc_cdc_duplicate_chunks",
    "dedup_substring_spans",
    "embedding_label_centroids",
    "bloom_membership_audit",
    "semdedup_prune",
    "streaming_hll_window_users",
    "bloom_incremental_dedup",
    "contrastive_hard_negatives",
    "crawl_frontier_schedule",
    "streaming_cms_window_users",
    "doc_mixture_interleave",
    "doc_mixture_weights",
    "token_cms_heavy_hitters",
    "dedup_embedding_blocked",
    "sync_outbox_tick",
    "outbox_dashboard",
    "doc_weighted_sample",
    "token_bigram_collocations",
    "doc_substring_dup_spans",
    "doc_substring_dedup_report",
    "doc_substring_dedup_cut",
    "search_documents_flat",
    "article_search_documents",
    "doc_build_scale",
    "dedup_edit_distance",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_incremental",
    "doc_token_stats",
    "doc_quality_filter",
    "doc_lang_id",
    "doc_fingerprint_dupes",
    "doc_repetition_scores",
    "doc_tfidf_topk",
    "benchmark_contamination",
    "pii_redaction",
    "dedup_best_of_cluster",
    "inline_ref_codes",
    "article_analysis",
    "multimodal_features",
    "doc_sequence_pack",
    "top_revenue_orders",
]


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect registration
    from worker_spark.queries import (  # noqa: F401
        bpeq,
        chunkq,
        dedupq,
        docflat,
        domain,
        embstatsq,
        frontierq,
        multimodalq,
        packq,
        profileq,
        relational,
        retrievalq,
        sampleq,
        selectionq,
        sketchq,
        simq,
        streamq,
        substrq,
        syncq,
        temporalq,
        textops,
    )

    ordered = {
        name: _REGISTRY[name] for name in _DRIVER_WINDOW if name in _REGISTRY
    }
    for name, spec in _REGISTRY.items():
        ordered.setdefault(name, spec)
    return ordered
