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


@register(
    "multimodal_resize",
    """
    WITH media AS (
        SELECT doc_id AS media_id,
               text,
               CAST(strlen(text) AS BIGINT) AS n,
               coalesce(list_sum(list_transform(range(1, length(text) + 1),
                                                i -> unicode(text[i]))), 0) % 1000003 AS checksum
        FROM documents
        WHERE doc_id % 3 = 0
    ),
    dims AS (
        SELECT media_id, text, n,
               CAST((n % 640) + 1 AS BIGINT) AS width,
               CAST((checksum % 480) + 1 AS BIGINT) AS height
        FROM media
    ),
    scaled AS (
        SELECT *,
               CASE WHEN greatest(width, height) > 64
                    THEN greatest(1, (width * 64) // greatest(width, height))
                    ELSE width END AS out_width,
               CASE WHEN greatest(width, height) > 64
                    THEN greatest(1, (height * 64) // greatest(width, height))
                    ELSE height END AS out_height
        FROM dims
    ),
    sized AS (
        SELECT *, least(n, out_width * out_height) AS out_n
        FROM scaled
    )
    SELECT media_id,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(out_width AS INTEGER) AS out_width,
           CAST(out_height AS INTEGER) AS out_height,
           CAST(out_n AS BIGINT) AS out_n_bytes,
           CAST(coalesce(list_sum(list_transform(range(1, out_n + 1),
                                                 i -> unicode(text[i]))), 0) % 1000003
                AS BIGINT) AS out_checksum
    FROM sized
    """,
    doc="Multimodal RESIZE stage: image payloads through an Arrow-"
    "batched mapInPandas resample (map-only, payload bytes never leave "
    "the partition; fan-in contract matches a PIL/libvips call — the "
    "codec is the env-blocked stub, the deterministic fake uses "
    "INTEGER-exact scale math so the oracle replays it bit-for-bit). "
    "The binary out_payload column is real plumbing; the registered "
    "row checks its derived stats.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.operators.multimodal import fake_resize, resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return resize_images(
        media, max_dim=64, decoder=fake_decode, resizer=fake_resize
    ).select(
        "media_id",
        "width",
        "height",
        "out_width",
        "out_height",
        "out_n_bytes",
        "out_checksum",
    )


@register(
    "multimodal_frame_sample",
    """
    WITH media AS (
        SELECT doc_id AS media_id,
               text,
               CAST(strlen(text) AS BIGINT) AS n
        FROM documents
        WHERE doc_id % 3 = 2
    ),
    vids AS (
        SELECT media_id, text, n, CAST((n % 300) + 1 AS BIGINT) AS n_frames
        FROM media
    ),
    frames AS (
        SELECT media_id, text, n, n_frames, CAST(u.fi AS BIGINT) AS fi
        FROM vids, UNNEST(range(0, n_frames, 30)) AS u(fi)
    )
    SELECT media_id,
           CAST(fi AS INTEGER) AS frame_index,
           CAST(len(range(fi + 1, n + 1, n_frames)) AS BIGINT) AS n_frame_bytes,
           CAST(coalesce(list_sum(list_transform(range(fi + 1, n + 1, n_frames),
                                                 i -> unicode(text[i]))), 0) % 1000003
                AS BIGINT) AS frame_checksum
    FROM frames
    """,
    doc="Multimodal FRAME-SAMPLE stage: video payloads fan out to one "
    "row per sampled frame (every 30th — the 1-fps-from-30fps "
    "production default) through an Arrow-batched mapInPandas stage; "
    "each output row carries a real binary frame payload (the "
    "deterministic fake strides the bytes so every frame is a distinct "
    "binary; swap in ffmpeg and nothing else changes). Bounded fan-out: "
    "n_frames/30 rows per video. The registered row checks the derived "
    "per-frame stats.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.operators.multimodal import (
        fake_frame_sample,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return sample_frames(
        media, every_k=30, decoder=fake_decode, sampler=fake_frame_sample
    ).select("media_id", "frame_index", "n_frame_bytes", "frame_checksum")
