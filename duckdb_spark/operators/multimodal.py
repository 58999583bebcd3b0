"""Multimodal column operators: opaque binary payloads + typed metadata.

Beyond-reference spec: image/audio/video travel as `binary` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over `mapInPandas` (per-partition batch
iterator — the right shape for expensive per-item Python work: one
serialization per batch, prefetched, scan-local / zero shuffles).

The codec is REAL for PNG/BMP (stdlib zlib decoder in operators/codec.py;
golden-file tested); JPEG/WebP/AVIF raise with the needed codec named so
deployments can plug PIL/cv2 into `decode_image` without touching the
Spark-side plumbing. `fake=True` keeps the deterministic hash-seeded
pseudo-decoder for payloads that aren't real images (the synthetic
documents fixture).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_bytes int, payload binary"
)

FEATURE_SCHEMA = "doc_id long, media_type string, feat array<float>, feat_dim int"


def attach_media(df: DataFrame, id_col: str, payload_col, media_type: str = "image") -> DataFrame:
    """Wrap a binary payload with typed metadata (the engine-level contract
    for multimodal tables): media struct with deterministic dims parsed
    from the payload header in a real deployment (stub: derived sizes)."""
    payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        (F.abs(F.xxhash64(payload)) % 1920 + 1).cast("int").alias("width"),
        (F.abs(F.xxhash64(payload, F.lit(1))) % 1080 + 1).cast("int").alias("height"),
        F.octet_length(payload).alias("n_bytes"),
        payload.alias("payload"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake feature vector from the payload digest."""
    h = hashlib.sha256(payload).digest()
    raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    return [
        int.from_bytes(raw[i * 4 : i * 4 + 4], "big") / 0xFFFFFFFF * 2 - 1
        for i in range(dim)
    ]


def decode_image(payload: bytes):
    """Real decoder entry point: stdlib PNG/BMP codec (operators/codec.py).
    JPEG/WebP/AVIF raise with the codec named — deployments plug PIL/cv2
    here without touching the mapInPandas plumbing."""
    from duckdb_spark.operators.codec import decode_image as _decode

    return _decode(payload)


def extract_features(df: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Per-item feature extraction over mapInPandas (Arrow batches).

    `fake=True` uses the deterministic stub decoder; `fake=False` calls
    `decode_image` (raises until a codec is installed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from duckdb_spark.operators.codec import image_features

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                data = bytes(payload)
                if fake:
                    feats.append(_fake_decode(data, dim))
                else:
                    feats.append(image_features(decode_image(data), dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feat": feats,
                    "feat_dim": dim,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling contract for video payloads: emits (doc_id, frame_no)
    rows for frames 0, n, 2n… of a fake frame count derived from size
    (real impl reads container metadata). Demonstrates the explode shape."""
    n_frames = (F.col("n_bytes") / 1000 + 1).cast("int")
    return df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_no"),
    )
