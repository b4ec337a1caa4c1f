"""Multimodal-column operators: image/audio/video as opaque ``binary``
payloads with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_stub`` raises ``NotImplementedError`` unless given the
deterministic fake decoder, which derives features purely from the byte
payload (so tests and the DuckDB oracle can reproduce them). Everything
around the stub — the schema contract, the batch iterator shape, the
partition sizing, the metadata join — is the real production plumbing:
swap ``fake_decode`` for a PIL/ffmpeg call and nothing else changes.

Scale notes: payloads stay columnar Arrow binaries end-to-end; the decode
stage is a map-only ``mapInPandas`` (no shuffle), so it scales linearly
with input splits. ``repartition`` before decoding only when upstream
produced too few splits for the executor count.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("source", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("byte_checksum", T.LongType(), False),
    ]
)


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Placeholder for the real codec call (PIL.Image.open / ffmpeg probe).
    Not available in this container."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; use fake_decode"
    )


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in deriving pseudo-features from the bytes:
    same signature and output contract as the real decoder."""
    n = len(payload)
    checksum = sum(payload) % 1_000_003
    return {
        "width": (n % 640) + 1 if media_type == "image" else None,
        "height": (checksum % 480) + 1 if media_type == "image" else None,
        "n_frames": (n % 300) + 1 if media_type == "video" else None,
        "byte_checksum": checksum,
    }


def extract_media_features(
    media: DataFrame, decoder: Callable[[bytes, str], dict] = decode_stub
) -> DataFrame:
    """The decode/feature-extract stage: Arrow batches in, feature rows
    out. The decoder runs once per payload inside the batch loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(payload, mtype)
                for payload, mtype in zip(pdf["payload"], pdf["media_type"])
            ]
            fdf = pd.DataFrame(feats)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": fdf.get("width"),
                    "height": fdf.get("height"),
                    "n_frames": fdf.get("n_frames"),
                    "byte_checksum": fdf["byte_checksum"].values,
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the driver testdata: documents.text re-cast as opaque
    binary payloads with metadata — the ingest shape a real multimodal
    table would have (media_type keyed off doc_id for coverage)."""
    mtype = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        payload.alias("payload"),
        F.col("source").alias("source"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
