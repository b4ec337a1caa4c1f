"""Profiling query: per-column ANALYZE statistics over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators.profile import PROFILE_PREFIX, table_profile
from worker_spark.queries import register
from worker_spark.queries.sketchq import quantile_sketch_oracle
from worker_spark.sources import load_table

_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

_PER_COL = "\n    UNION ALL\n".join(
    f"""    SELECT '{c}' AS column,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           substr(CAST(min({c}) AS VARCHAR), 1, {PROFILE_PREFIX})
               AS min_prefix,
           substr(CAST(max({c}) AS VARCHAR), 1, {PROFILE_PREFIX})
               AS max_prefix
    FROM documents"""
    for c in _COLS
)


@register(
    "documents_profile",
    _PER_COL,
    doc="Table profiling (the ANALYZE surface): row/null/exact-distinct "
    "counts and min/max 32-char prefixes for every documents column, "
    "computed in ONE aggregation pass and unpivoted to a row per column. "
    "Profiles feed planner thresholds and ingest quality gates; the cost "
    "at scale is the single scan.",
)
def q_documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return table_profile(docs, _COLS)


@register(
    "doc_length_quantiles",
    quantile_sketch_oracle("documents", "lang", "doc_id", "n_chars"),
    doc="Distribution profiling via the deterministic quantile sketch "
    "(sketches.quantile_sketch_audit) as a first-class ANALYZE surface: "
    "p50/p90/p99 document length per language with per-group rank-error "
    "audit. At sf0.01 every language group fits the k=512 sketch (exact "
    "path); at sf0.1 every group exceeds it (sampled path) — the same "
    "query exercises both regimes. Scale shape: bounded two-level agg, "
    "no Sort/Window (plan-asserted for the operator).",
)
def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.operators.sketches import quantile_sketch_audit

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    return quantile_sketch_audit(docs, "n_chars", "doc_id", "lang")
