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


def resize_stub(payload: bytes, width: int, height: int, max_dim: int) -> dict:
    """Placeholder for the real resampler (PIL thumbnail / libvips).
    Not available in this container."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; use fake_resize"
    )


def frame_sample_stub(payload: bytes, n_frames: int, every_k: int) -> list:
    """Placeholder for the real frame extractor (ffmpeg select filter).
    Not available in this container."""
    raise NotImplementedError(
        "video codecs are not installed in this environment; use "
        "fake_frame_sample"
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("out_payload", T.BinaryType(), False),
        T.StructField("out_n_bytes", T.LongType(), False),
        T.StructField("out_checksum", T.LongType(), False),
    ]
)


def fake_resize(payload: bytes, width: int, height: int, max_dim: int) -> dict:
    """Deterministic stand-in for the real resampler (PIL thumbnail /
    libvips): INTEGER-exact scale math — out = max(1, dim*max_dim //
    max(w,h)) when the image exceeds max_dim, unchanged otherwise — and
    a pseudo 'resized' payload (the byte prefix sized to the new pixel
    budget) so the output contract (binary out, derived stats) matches
    a real codec's. Integer division keeps the oracle engine-exact: no
    float scale factor to diverge on."""
    longest = max(width, height)
    if longest > max_dim:
        out_w = max(1, width * max_dim // longest)
        out_h = max(1, height * max_dim // longest)
    else:
        out_w, out_h = width, height
    out = payload[: min(len(payload), out_w * out_h)]
    return {
        "out_width": out_w,
        "out_height": out_h,
        "out_payload": out,
        "out_checksum": sum(out) % 1_000_003,
    }


def resize_images(
    media: DataFrame,
    max_dim: int = 64,
    decoder: Callable[[bytes, str], dict] = decode_stub,
    resizer: Callable[[bytes, int, int, int], dict] | None = None,
) -> DataFrame:
    """The resize stage of a multimodal ingest pipeline: image payloads
    in, bounded-dimension payloads out — Arrow-batched ``mapInPandas``,
    map-only (no shuffle), payload bytes never leave the partition.
    ``resizer`` defaults to the env-blocked real-codec stub; pass
    ``fake_resize`` for the deterministic byte-math stand-in (swap in
    PIL and nothing else changes — the schema, batch shape and stats
    contract are the production plumbing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                feats = decoder(payload, mtype)
                r = (resizer or resize_stub)(
                    payload, feats["width"], feats["height"], max_dim
                )
                rows.append(
                    {
                        "media_id": media_id,
                        "width": feats["width"],
                        "height": feats["height"],
                        "out_width": r["out_width"],
                        "out_height": r["out_height"],
                        "out_payload": r["out_payload"],
                        "out_n_bytes": len(r["out_payload"]),
                        "out_checksum": r["out_checksum"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
        T.StructField("n_frame_bytes", T.LongType(), False),
        T.StructField("frame_checksum", T.LongType(), False),
    ]
)


def fake_frame_sample(payload: bytes, n_frames: int, every_k: int) -> list:
    """Deterministic stand-in for the real frame extractor (ffmpeg
    select filter): frame fi's pseudo-payload is the byte stride
    ``payload[fi::n_frames]`` — every byte belongs to exactly one frame,
    so the sampled 'frames' are genuinely distinct binaries with a
    checksum the oracle can replay as a stepped range sum."""
    return [
        {
            "frame_index": fi,
            "frame_payload": payload[fi::n_frames],
            "frame_checksum": sum(payload[fi::n_frames]) % 1_000_003,
        }
        for fi in range(0, n_frames, every_k)
    ]


def sample_frames(
    media: DataFrame,
    every_k: int = 30,
    decoder: Callable[[bytes, str], dict] = decode_stub,
    sampler: Callable[[bytes, int, int], list] | None = None,
) -> DataFrame:
    """The frame-sampling stage for video payloads (one frame per
    ``every_k`` — the 1-fps-from-30fps production default): one input
    row fans out to one row PER SAMPLED FRAME, each carrying a binary
    frame payload. Arrow-batched ``mapInPandas``, map-only; the fan-out
    is bounded by n_frames/every_k per video, so output volume is a
    controlled multiple of input rows — the shape a downstream
    image-embedding stage consumes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                feats = decoder(payload, mtype)
                frames = (sampler or frame_sample_stub)(
                    payload, feats["n_frames"], every_k
                )
                for fr in frames:
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_index": fr["frame_index"],
                            "frame_payload": fr["frame_payload"],
                            "n_frame_bytes": len(fr["frame_payload"]),
                            "frame_checksum": fr["frame_checksum"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA])

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the driver testdata: documents.text re-cast as opaque
    binary payloads with metadata — the ingest shape a real multimodal
    table would have (media_type keyed off doc_id for coverage).

    ASCII invariant, ASSERTED (r11 advice): the fake codec stages
    operate on UTF-8 BYTES of the payload (a real codec sees bytes)
    while their DuckDB oracles index CHARACTERS of the source text
    (strlen / text[i] / unicode) — the two agree only when every
    character is one byte. The synth corpus is ASCII by construction;
    this boundary enforces it with a raise_error so a future non-ASCII
    fixture fails loudly here instead of silently diverging in
    width/checksum/frame math downstream. octet_length == length is
    exactly the one-byte-per-codepoint test, no regex needed."""
    mtype = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    ascii_text = F.when(
        F.octet_length(F.col("text")) == F.length(F.col("text")),
        F.col("text"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "documents_as_media: non-ASCII text in doc_id "
                ),
                F.col("doc_id").cast("string"),
                F.lit(
                    " — the fake codec oracles assume codepoint==byte; "
                    "see operators/multimodal.py"
                ),
            )
        )
    )
    payload = F.encode(ascii_text, "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        payload.alias("payload"),
        F.col("source").alias("source"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
