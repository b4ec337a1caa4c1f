"""Sequence-packing queries over ``documents`` (training-data pipeline).

Spark side: worker_spark.operators.packing (shard-parallel exact greedy via
applyInPandas). Oracle side: the same greedy walk replayed as a DuckDB
recursive CTE stepping row-by-row within each shard (depth = max rows per
shard — fine at oracle scale; the Spark path is the scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators import packing as P
from worker_spark.queries import register
from worker_spark.sources import load_table

_BUDGET = 256
_SHARDS = 8

# DuckDB token count for a document (identical to textops._TOKS semantics).
_NTOK = (
    "CAST(len(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[] "
    "ELSE string_split_regex(trim(text), '\\s+') END) AS BIGINT)"
)


def _walk_cte() -> str:
    """Recursive greedy walk shared by both packing oracles."""
    return f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id,
               doc_id % {_SHARDS} AS shard,
               {_NTOK} AS n_tokens
        FROM documents
    ),
    ord AS (
        SELECT shard, doc_id, n_tokens,
               row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM toks
    ),
    walk AS (
        SELECT shard, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS pack_seq,
               greatest(n_tokens, 1) AS cum
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN w.cum + greatest(o.n_tokens, 1) > {_BUDGET}
                    THEN w.pack_seq + 1 ELSE w.pack_seq END,
               CASE WHEN w.cum + greatest(o.n_tokens, 1) > {_BUDGET}
                    THEN greatest(o.n_tokens, 1)
                    ELSE w.cum + greatest(o.n_tokens, 1) END
        FROM ord o JOIN walk w ON o.shard = w.shard AND o.rn = w.rn + 1
    )
    """


@register(
    "doc_sequence_pack",
    _walk_cte()
    + """
    SELECT shard, doc_id, n_tokens, pack_seq FROM walk
    """,
    doc=f"Greedy sequence packing into {_BUDGET}-token budgets, exact greedy "
    f"per shard (doc_id % {_SHARDS}), shard-parallel applyInPandas; oracle "
    "replays the walk as a recursive CTE.",
)
def q_doc_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return P.greedy_pack(docs, budget=_BUDGET, n_shards=_SHARDS)


@register(
    "pack_utilization",
    _walk_cte()
    + f"""
    SELECT shard, pack_seq,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / {_BUDGET}.0, 6) AS utilization
    FROM walk
    GROUP BY shard, pack_seq
    """,
    doc="Per-pack utilization summary over the greedy packing (padding-waste "
    "observability for the training-data pipeline).",
)
def q_pack_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    packed = P.greedy_pack(docs, budget=_BUDGET, n_shards=_SHARDS)
    return P.pack_stats(packed, budget=_BUDGET)
