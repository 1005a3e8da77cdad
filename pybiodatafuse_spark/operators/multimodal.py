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


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = bytes((i * 7 + j) % 251 for j in range(64 + (i % 5) * 32))
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, payload, ("application/octet-stream", 8, 8, 1000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
