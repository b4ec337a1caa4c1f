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
# In-window: every query that has never had a green driver row, queries whose
# code or oracle changed this round, then one representative per operator
# family. Rotated past the window: redundant single-operator exercises
# (TPC-H-style rows whose operators richer in-window queries already cover) —
# those stay pinned by the in-repo DuckDB parity test, which runs ALL entries.
_DRIVER_WINDOW = [
    # never driver-verified before round 3
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
    # green in r1 but outside the r2 window
    "similarity_cosine_topk",
    "similarity_lsh_ann",
    "streaming_event_window_counts",
    "outbox_dedup_append",
    "reverse_invalidation",
    # changed (code or oracle) in round 3
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
    # new in round 3 (late additions)
    "doc_gopher_rules",
    "doc_lm_score",
    "doc_split_assign",
    "doc_mixture_weights",
    "doc_cdc_chunks_clamped",
    "doc_substring_dup_spans",
    "doc_substring_dedup_report",
    "hll_distinct_users",
    "kmv_distinct_users",
    "token_cms_heavy_hitters",
    "bpe_train_merges",
    "dedup_edit_distance",
    "token_bigram_collocations",
    "inverted_index_postings",
    "bpe_encode_stats",
    "streaming_view_purchase_join",
    "similarity_opq_kmeans_topk",
    "doc_weighted_sample",
    "streaming_dedup_keys",
    "dedup_pagerank_centrality",
    "doc_substring_dedup_cut",
    "documents_profile",
    # one representative per operator family (all green in r2)
    "article_search_documents",
    "search_documents_flat",
    "doc_build_scale",
    # rotated out for the round-3 additions (all green in r2, families
    # still represented in-window): event_sessions, doc_sequence_pack
    # (pack_utilization covers packing), doc_token_stats,
    # doc_quality_filter, doc_lang_id (doc_gopher_rules/doc_lm_score
    # cover the text-quality family), dedup_exact (dedup_best_of_cluster
    # exercises the same hash-groupBy), inline_ref_codes (inline_ref_parse
    # in-window covers the same operator with byte offsets),
    # dedup_ngram_jaccard (minhash/incremental cover banded shingle dedup),
    # multimodal_features, benchmark_contamination, doc_tfidf_topk,
    # dedup_simhash, sync_diff_classify, outbox_drain_cap, pii_redaction,
    # dedup_incremental, dedup_best_of_cluster, article_analysis,
    # dedup_minhash_lsh (its signature+banding pipeline runs in-window
    # inside dedup_edit_distance), outbox_dashboard, sync_outbox_tick and
    # dedup_embedding_blocked (green r1; the ANN family keeps nine other
    # in-window rows) — all green in r1 or r2, self-contained families,
    # in-repo parity still runs them
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
        multimodalq,
        packq,
        profileq,
        relational,
        retrievalq,
        sampleq,
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
