"""Multimodal-pipeline query: binary payload -> mapInPandas decode ->
feature table. The fake decoder is deterministic arithmetic over the
payload bytes, so the DuckDB oracle reproduces it exactly (documents.text
is ASCII: codepoint == byte)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators.multimodal import (
    documents_as_media,
    extract_media_features,
    fake_decode,
)
from worker_spark.queries import register
from worker_spark.sources import load_table


@register(
    "multimodal_features",
    """
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               text,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               coalesce(list_sum(list_transform(range(1, length(text) + 1),
                                                i -> unicode(text[i]))), 0) % 1000003 AS checksum
        FROM documents
    )
    SELECT media_id, media_type, n_bytes,
           CAST(CASE WHEN media_type = 'image' THEN (n_bytes % 640) + 1 END AS INTEGER) AS width,
           CAST(CASE WHEN media_type = 'image' THEN (checksum % 480) + 1 END AS INTEGER) AS height,
           CAST(CASE WHEN media_type = 'video' THEN (n_bytes % 300) + 1 END AS INTEGER) AS n_frames,
           CAST(checksum AS BIGINT) AS byte_checksum
    FROM media
    """,
    doc="Multimodal column plumbing: opaque binary payloads + typed "
    "metadata through an Arrow-batched mapInPandas decode stage (decoder "
    "stubbed deterministically; schema/batch contract is production-real).",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return extract_media_features(media, decoder=fake_decode)
