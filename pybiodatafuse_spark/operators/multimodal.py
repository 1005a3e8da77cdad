"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; the
decode/feature kernels run as Arrow-batched ``mapInPandas`` operators so each
partition processes media in vectorized batches without driver involvement.

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this container,
so the decode step is STUBBED: ``decode_fn="fake"`` gives a deterministic
byte-statistics pseudo-decoder (keeps every Spark-side contract — schema,
batching, partitioning — real and testable); ``decode_fn="real"`` raises
``NotImplementedError`` where the codec call would go.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)

_FEAT_DIM = 8


def _fake_decode_batch(payloads: pd.Series) -> list[np.ndarray]:
    """Deterministic pseudo-decoder: fixed-dim byte-statistics features.
    Stands in for image-resize / audio-frame / video-sample kernels."""
    feats = []
    for p in payloads:
        if p is None:
            feats.append(np.zeros(_FEAT_DIM, dtype=np.float32))
            continue
        arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
        if arr.size == 0:
            arr = np.zeros(1)
        chunks = np.array_split(arr, _FEAT_DIM)
        feats.append(
            np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)
        )
    return feats


def extract_features(
    media: DataFrame, *, decode_fn: str = "fake", batch_partitions: int | None = None
) -> DataFrame:
    """media(media_id, kind, payload, meta) → (media_id, n_bytes, features).

    ``decode_fn="real"`` marks where a PIL/ffmpeg kernel plugs in; this
    container has no codec libs, so it raises at executor time by design.
    """
    if decode_fn not in ("fake", "real"):
        raise ValueError(decode_fn)
    src = media.select("media_id", "payload")
    if batch_partitions:
        src = src.repartition(batch_partitions)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (unavailable here); "
                    "use decode_fn='fake' for the deterministic stub"
                )
            feats = _fake_decode_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": [
                        0 if p is None else len(bytes(p)) for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return src.mapInPandas(op, schema=FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.IntegerType()), False),
    ]
)


def resize_images(
    media: DataFrame, *, width: int = 4, height: int = 4, decode_fn: str = "fake"
) -> DataFrame:
    """image rows → (media_id, width, height, pixels[w*h]) — the resize
    kernel's Spark contract. Fake decoder: average-pool the payload bytes
    into a w×h grid (where PIL's ``Image.resize`` plugs in)."""
    if decode_fn not in ("fake", "real"):
        raise ValueError(decode_fn)
    src = media.where(F.col("kind") == "image").select("media_id", "payload")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn == "real":
                raise NotImplementedError("PIL unavailable; use decode_fn='fake'")
            out = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p or b"\x00"), dtype=np.uint8)
                cells = np.array_split(arr.astype(np.float64), width * height)
                out.append([int(c.mean()) if c.size else 0 for c in cells])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": width,
                    "height": height,
                    "pixels": out,
                }
            )

    return src.mapInPandas(op, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_feature", T.ArrayType(T.FloatType()), False),
    ]
)


def sample_frames(
    media: DataFrame, *, every_ms: int = 250, decode_fn: str = "fake"
) -> DataFrame:
    """video rows → one row per sampled frame (media_id, frame_idx,
    frame_feature) — the frame-sampling contract (ffmpeg's seek+decode plugs
    in). Fake decoder: frame count = duration_ms // every_ms, features =
    byte-stat slice per frame. Output is a per-frame EXPLOSION (row count
    grows), which is the real shape downstream training pipelines consume."""
    if decode_fn not in ("fake", "real"):
        raise ValueError(decode_fn)
    src = media.where(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn == "real":
                raise NotImplementedError("ffmpeg unavailable; use decode_fn='fake'")
            ids, idxs, feats = [], [], []
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n_frames = max(1, int((dur or every_ms) // every_ms))
                arr = np.frombuffer(bytes(p or b"\x00"), dtype=np.uint8).astype(np.float64)
                for fi in range(n_frames):
                    seg = arr[fi::n_frames]
                    chunks = np.array_split(seg if seg.size else np.zeros(1), 4)
                    ids.append(mid)
                    idxs.append(fi)
                    feats.append(
                        np.array(
                            [c.mean() if c.size else 0.0 for c in chunks],
                            dtype=np.float32,
                        )
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_feature": feats}
            )

    return src.mapInPandas(op, schema=FRAME_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = bytes((i * 7 + j) % 251 for j in range(64 + (i % 5) * 32))
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, payload, ("application/octet-stream", 8, 8, 1000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
