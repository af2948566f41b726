"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample as Arrow
batch kernels over ``mapInPandas``.

The image/audio codec libraries are NOT in this container, so the decode
step is STUBBED (clearly marked NotImplementedError, or a deterministic fake
feature extractor) — but the Spark-side plumbing is real and tested: schema
(binary + struct metadata), partition-preserving batch kernels, Arrow batch
shapes, and the downstream join/dedup path over extracted features.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

_DECODERS_AVAILABLE = False  # PIL / ffmpeg / soundfile are not installed here
try:  # pragma: no cover - container has no codec libs
    import PIL  # noqa: F401

    _DECODERS_AVAILABLE = True
except ImportError:
    pass


def synthesize_media(spark, n_rows: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with binary payloads (test fixture)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {
                "media_id": ids,
                "kind": [["image", "audio", "video"][int(i) % 3] for i in ids],
                "payload": [
                    hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4 for i in ids
                ],
                "meta": [
                    {
                        "width": 64 + int(i) % 512,
                        "height": 64 + (int(i) * 7) % 512,
                        "n_frames": 1 + int(i) % 30,
                        "sample_rate": 16000,
                    }
                    for i in ids
                ],
            }
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real decode requires codec libs absent from this container."""
    if not _DECODERS_AVAILABLE:
        raise NotImplementedError(
            "STUB: image decoding needs PIL/libvips, which this environment "
            "does not ship. The Arrow plumbing path is extract_features()."
        )
    raise NotImplementedError("decoder wiring not implemented")


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 32,
) -> DataFrame:
    """Deterministic fake feature extractor over the binary payload —
    stands in for a real decode+embed kernel with identical Spark-side
    shape: binary in → fixed-size float vector out, Arrow-batched,
    partition-preserving (no shuffle). Returns [<id_col>, features]."""

    def kernel(batches):
        for pdf in batches:
            feats = []
            for buf in pdf[payload_col]:
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                # fold payload bytes into `dim` buckets — deterministic,
                # vectorized, byte-order independent of partitioning
                pad = (-len(b)) % dim
                folded = np.pad(b, (0, pad)).reshape(-1, dim).sum(axis=0)
                v = folded.astype(np.float64)
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_type}, features array<float>"
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize plan for image rows: binary in → binary out with updated meta,
    Arrow-batched, partition-preserving. The pixel resample itself is
    STUBBED (no codec libs in this container) with a deterministic
    byte-fold to exactly width·height bytes — the Spark-side shape (schema,
    batch signature, meta rewrite) is the real thing a PIL/libvips kernel
    would drop into. Returns [<id_col>, payload, meta]."""

    target = width * height

    def kernel(batches):
        for pdf in batches:
            out = []
            for buf in pdf[payload_col]:
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                if len(b) == 0:
                    out.append(bytes(target))
                    continue
                reps = -(-target // len(b))  # ceil tile, then crop
                out.append(np.tile(b, reps)[:target].tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": out,
                    "meta": [
                        {"width": width, "height": height, "n_frames": 1,
                         "sample_rate": 0}
                    ] * len(pdf),
                }
            )

    id_type = dict(df.dtypes)[id_col]
    meta_t = "struct<width:int,height:int,n_frames:int,sample_rate:int>"
    return (
        df.filter(F.col("kind") == "image")
        .select(id_col, payload_col)
        .mapInPandas(kernel, f"{id_col} {id_type}, payload binary, meta {meta_t}")
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 5,
    id_col: str = "media_id",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-sampling plan for video rows: explodes frame indices 0, n, 2n …
    (JVM sequence — the decode of each frame would be a kernel like
    extract_features). Returns [<id_col>, frame_idx]."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col(f"{meta_col}.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )
