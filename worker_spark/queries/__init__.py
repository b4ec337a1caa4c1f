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
# Round-4 rotation (VERDICT r3 item 1): (a) the 3 queries that have NEVER
# had a driver row, (b) the 3 whose last green row was round 1, (c) every
# query whose code or oracle changed in round 4, then (d) the 41 queries
# last green in round 2, longest-stale first-in. Everything past position
# 50 was driver-green in round 3 and unchanged since; the in-repo DuckDB
# parity test (tests/test_oracle_parity.py) still replays ALL entries.
_DRIVER_WINDOW = [
    # (a) never driver-verified (landed after the r3 driver run)
    "doc_cdc_duplicate_chunks",
    "dedup_substring_spans",
    "embedding_label_centroids",
    # (a cont.) new in round 4
    "bloom_membership_audit",
    "doc_dsir_selection",
    "semdedup_prune",
    "streaming_hll_window_users",
    "bloom_incremental_dedup",
    "contrastive_hard_negatives",
    "doc_curation_decision",
    "crawl_frontier_schedule",
    "streaming_cms_window_users",
    "doc_mixture_interleave",
    # (c cont.) shared w_q / cms_place helpers touched these two
    "doc_mixture_weights",
    "token_cms_heavy_hitters",
    # (b) last green in round 1
    "dedup_embedding_blocked",
    "sync_outbox_tick",
    "outbox_dashboard",
    # (c) code/oracle changed in round 4 (ADVICE fixes: priority-sample
    # divisor guard, lift cast order, 31-bit winnowing position field,
    # mergeable KMV bottom-k)
    "doc_weighted_sample",
    "token_bigram_collocations",
    "kmv_distinct_users",
    "doc_substring_dup_spans",
    "doc_substring_dedup_report",
    "doc_substring_dedup_cut",
    # (c cont.) extraction layer rebuilt as shared-subtree batched
    # selects (analysis-overhead fix) — re-verify the flagship family
    "search_documents_flat",
    "article_search_documents",
    "doc_build_scale",
    # (c cont.) BPE training batched (disjoint merge batches per round,
    # localCheckpoint lineage cuts) — both queries' code AND oracles changed
    "bpe_train_merges",
    "bpe_encode_stats",
    # (c cont.) edit-distance verify gained the prefix cap + thresholded DP
    "dedup_edit_distance",
    # (c cont.) doc_bigram_counts rewritten (linear RLE + repartition)
    "doc_lm_score",
    # (d) last green in round 2, filling the window to 50
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_incremental",
    "doc_token_stats",
    "doc_quality_filter",
    "doc_lang_id",
    "doc_fingerprint_dupes",
    "event_value_percentiles",
    "doc_repetition_scores",
    "doc_tfidf_topk",
    "benchmark_contamination",
    "pii_redaction",
    "dedup_best_of_cluster",
    "inline_ref_codes",
    "article_analysis",
    "multimodal_features",
    "doc_sequence_pack",
    # pricing_summary / status_counts / key_roundtrip displaced past the
    # boundary by the flagship re-verification (their operators are covered
    # in-window by outbox_dashboard and the relational family); they join
    # the round-5 stale leads
    "top_revenue_orders",
    "event_sessions",
    "order_rollup",
    "cheapest_supplier_per_part",
    # ---- driver window boundary: only the FIRST 50 entries above get a
    # driver row this round; the r2-stale tail that overflows position 50
    # leads the next rotation. Entries below were green in round 3 and are
    # unchanged; parity-test-pinned until their next rotation. ----
    "doc_quota_sample",
    "similarity_ivf_ann",
    "similarity_quantized_topk",
    "similarity_pq_adc_topk",
    "similarity_pq_refined_topk",
    "streaming_stateful_sessions",
    "place_crawl_closure",
    "url_build_redact",
    "event_asof_attribution",
    "event_range_join",
    "similarity_cosine_topk",
    "similarity_lsh_ann",
    "streaming_event_window_counts",
    "outbox_dedup_append",
    "reverse_invalidation",
    "pack_utilization",
    "doc_mixture_report",
    "doc_stratified_sample",
    "dedup_cluster_components",
    "inline_ref_parse",
    "doc_char_entropy",
    "search_index_config",
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
    # displaced from block (d) this round (last green r2; operators covered
    # in-window); stale-leads for round 5 together with the 3 (d) overflows
    "orders_with_returns",
    "customers_without_orders",
    "customer_any_return",
    "outbox_drain_cap",
    "global_cursors",
    "revenue_by_nation",
    "top3_orders_per_segment",
    "sync_diff_classify",
    "active_entity_keys",
    "positional_list_parse",
    "recent_event_stats",
    "code_first_id_wins",
    "name_fallback_resolution",
    "dedup_minhash_lsh",
    "orders_per_customer_list",
    "event_journey",
    "pricing_summary",
    "status_counts",
    "key_roundtrip",
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
