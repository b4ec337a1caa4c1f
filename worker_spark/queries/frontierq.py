"""Crawl-frontier scheduling query over ``documents``.

Spark side: worker_spark.operators.frontier — hash-to-fetcher host
assignment + exact round-robin politeness ticks. Oracle side: identical
hash, ranks, and arithmetic in DuckDB window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators import frontier as FR
from worker_spark.queries import register
from worker_spark.sources import load_table

_NF = FR.N_FETCHERS


@register(
    "crawl_frontier_schedule",
    f"""
    WITH q AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % {_NF}
                   AS fetcher
        FROM documents
    ),
    idx AS (
        SELECT fetcher, source,
               CAST(row_number() OVER (PARTITION BY fetcher
                                       ORDER BY source) - 1 AS BIGINT)
                   AS src_idx,
               CAST(count(*) OVER (PARTITION BY fetcher) AS BIGINT)
                   AS n_sources
        FROM (SELECT DISTINCT fetcher, source FROM q)
    ),
    ranked AS (
        SELECT doc_id, source, fetcher,
               CAST(row_number() OVER (PARTITION BY source
                                       ORDER BY doc_id) - 1 AS BIGINT) AS k
        FROM q
    )
    SELECT r.doc_id, r.source, r.fetcher, i.n_sources,
           r.k * i.n_sources + i.src_idx AS tick
    FROM ranked r JOIN idx i USING (fetcher, source)
    """,
    doc=f"Crawl-frontier politeness scheduler: every source hashes to one "
    f"of {_NF} fetchers (per-host serialization), each fetcher cycles its "
    "sources round-robin — tick = k * n_sources + source_index, which is "
    "collision-free by construction and spaces same-source fetches by "
    "EXACTLY the fetcher's cycle length. Source-level aggregates only; "
    "no shuffle carries document payloads. Generalizes the reference's "
    "per-dictionary fetch pacing (src/article_fetch_service.rs) to the "
    "multi-host frontier a web-scale pipeline feeds from.",
)
def q_crawl_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return FR.schedule_frontier(docs.select("doc_id", "source"))
