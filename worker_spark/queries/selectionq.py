"""Importance-weighted data selection query over ``documents``.

Spark side: worker_spark.operators.selection — DSIR-style importance
log-weights (target = English documents) from char-bigram bag models
with add-one smoothing, integer-micro ln quantization, and a
TakeOrdered top-k selection. Oracle side: the identical models, the
identical per-bigram micro-quantized log-ratio, and the identical
integer weight sums replayed in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.operators import selection as S
from worker_spark.operators.text import LM_MICRO
from worker_spark.queries import register
from worker_spark.sources import load_table

_K = S.DSIR_TOP_K
_TARGET_LANG = "en"

_DSIR_SQL = f"""
    WITH dbc AS (
        SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS cnt
        FROM (
            SELECT doc_id, substr(lower(text), CAST(i AS INT), 2) AS bigram
            FROM documents, UNNEST(range(1, length(text))) AS t(i)
            WHERE length(text) >= 2
        ) GROUP BY 1, 2
    ),
    flags AS (
        SELECT doc_id, lang = '{_TARGET_LANG}' AS is_target FROM documents
    ),
    raw AS (
        SELECT bigram, CAST(sum(cnt) AS BIGINT) AS c_raw FROM dbc GROUP BY 1
    ),
    tgt AS (
        SELECT d.bigram, CAST(sum(d.cnt) AS BIGINT) AS c_tgt
        FROM dbc d JOIN flags f USING (doc_id)
        WHERE f.is_target GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(c_raw) AS BIGINT) AS t_raw,
               CAST(count(*) AS BIGINT) AS v
        FROM raw
    ),
    ttot AS (
        SELECT CAST(coalesce(sum(c_tgt), 0) AS BIGINT) AS t_tgt FROM tgt
    ),
    model AS (
        SELECT r.bigram,
               CAST(round(ln(CAST(coalesce(g.c_tgt, 0) + 1 AS DOUBLE)
                             / (tt.t_tgt + t.v)) * {LM_MICRO}) AS BIGINT)
             - CAST(round(ln(CAST(r.c_raw + 1 AS DOUBLE)
                             / (t.t_raw + t.v)) * {LM_MICRO}) AS BIGINT)
                   AS lr_micro
        FROM raw r LEFT JOIN tgt g USING (bigram), tot t, ttot tt
    ),
    w AS (
        SELECT d.doc_id, CAST(sum(d.cnt) AS BIGINT) AS n_bigrams,
               CAST(sum(d.cnt * m.lr_micro) AS BIGINT) AS w_micro
        FROM dbc d JOIN model m USING (bigram) GROUP BY 1
    )
    SELECT w.doc_id, f.is_target, w.n_bigrams,
           round(CAST(w.w_micro AS DOUBLE) / {float(LM_MICRO)!r}, 6) AS logw,
           round(CAST(w.w_micro AS DOUBLE)
                 / ({float(LM_MICRO)!r} * w.n_bigrams), 6) AS avg_logratio
    FROM w JOIN flags f USING (doc_id)
    ORDER BY logw DESC, w.doc_id ASC
    LIMIT {_K}
"""


@register(
    "doc_dsir_selection",
    _DSIR_SQL,
    doc=f"DSIR-style importance-weighted data selection (Xie et al. "
    f"2023): char-bigram bag models for the TARGET (lang={_TARGET_LANG}) "
    "and RAW distributions (two bounded groupBys broadcast back — no "
    "shuffle carries text), add-one smoothing over the raw vocab, "
    "per-bigram log-ratio quantized to integer micros so document "
    f"weights are exact integer sums, top-{_K} selection via distributed "
    "TakeOrdered with doc_id tie-break. The data-SELECTION complement to "
    "the dedup/quality operator families.",
)
def q_doc_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.select_top_k(
        S.importance_weights(docs, F.col("lang") == _TARGET_LANG)
    )


def _cluster_balance_oracle() -> str:
    # the cells CTE replays similarity.ivf_assign exactly as
    # similarity_ivf_ann's oracle does (same rounding, same tie-break)
    from worker_spark.operators.selection import CLUSTER_BALANCE_CAP
    from worker_spark.queries.simq import _cos_expr

    # the stride CTE replays similarity.auto_centroid_stride(count):
    # max(100, round(sqrt(N))) — a pure integer function of the corpus
    # count, so the auto-strided operator stays hash-checkable (both
    # engines take IEEE sqrt of the same integer; round() only differs
    # at an exact .5 double, which sqrt of an integer cannot produce
    # below N ~ 2^100)
    return f"""
    WITH stride AS (
        SELECT greatest(100, CAST(round(sqrt(CAST(count(*) AS DOUBLE)))
                                  AS BIGINT)) AS s
        FROM embeddings
    ),
    cents AS (
        SELECT vec_id AS cent_id, embedding FROM embeddings, stride
        WHERE vec_id % stride.s = 0
    ),
    assign_scored AS (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {_cos_expr('e', 'c')} DESC NULLS LAST,
                            c.cent_id) AS rn
        FROM embeddings e JOIN cents c ON TRUE
    ),
    cells AS (
        SELECT vec_id, cent_id AS cell_id FROM assign_scored WHERE rn = 1
    )
    SELECT vec_id, cell_id,
           CAST(count(*) OVER (PARTITION BY cell_id) AS BIGINT) AS cell_n,
           row_number() OVER (PARTITION BY cell_id
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               <= {CLUSTER_BALANCE_CAP} AS kept
    FROM cells
    """


@register(
    "embedding_cluster_balance",
    _cluster_balance_oracle(),
    doc="Cluster-balanced selection (the cluster-balancing step of "
    "SemDeDup-era curation pipelines, Abbas et al. 2023): IVF medoid "
    "cells (AUTO stride max(100, round(sqrt(N))) — K ~ sqrt(N), the "
    "broadcast stays tiny and assignment is O(N^1.5); the oracle "
    "re-derives the stride from count(*), so the row is hash-checkable "
    "at any SF), max-cosine assignment — the exact similarity_ivf_ann "
    "quantizer — then at most CLUSTER_BALANCE_CAP items kept per cell "
    "by md5 rank. Flattens topic-frequency bias: head clusters "
    "downsample to the cap, tail clusters survive whole. One broadcast "
    "+ one cell_id shuffle — no pairwise stage; reproducible across "
    "runs and layouts.",
)
def q_embedding_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return S.cluster_balanced_sample(emb, centroid_every="auto")
