"""Multimodal columns: image/audio/video as opaque binary + metadata.

The decode libraries (PIL/torchaudio/ffmpeg) are not in this container,
so the *decode step* is stubbed behind a deterministic fake — but the
Spark-side plumbing is real and tested: schema, partition-preserving
mapInPandas, Arrow batch shapes, and the UDF signature a real decoder
would drop into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal row: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("modality", StringType()),   # image|audio|video
        StructField("payload", BinaryType()),    # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),     # image/video
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),  # audio/video
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("modality", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),  # decoder output
        StructField("decode_ok", StringType()),
    ]
)


def media_schema() -> StructType:
    return MEDIA_SCHEMA


def _fake_decode(payload: bytes, modality: str, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for image-resize / audio-feature /
    frame-sample decoding. A real deployment replaces THIS function
    only — batch plumbing stays identical.

    Raises NotImplementedError for modalities a real decoder would
    need a codec for, mirroring how the stub boundary is documented.
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    # digest bytes into n_features deterministic floats
    acc = [0] * n_features
    for i, b in enumerate(payload or b""):
        acc[i % n_features] = (acc[i % n_features] * 31 + b) % 100003
    return [a / 100003.0 for a in acc]


def decode_media_batch(
    df: DataFrame, n_features: int = 8, batch_hint: int | None = None
) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    Partition-preserving (no shuffle); each Arrow batch is decoded in
    one Python call. At 100 TB the payload column dominates — a real
    pipeline orders this AFTER all metadata filters so column pruning
    keeps undecoded payloads out of memory for dropped rows.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                try:
                    feats.append(_fake_decode(payload, modality, n_features))
                    oks.append("ok")
                except NotImplementedError as e:
                    feats.append(None)
                    oks.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": feats,
                    "decode_ok": oks,
                }
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video", "hologram"][i % 4]
        payload = bytes([(i * 7 + j) % 256 for j in range(16 + i % 5)])
        rows.append(
            (
                f"m{i:04d}", modality, payload, f"x/{modality}",
                64 if modality != "audio" else None,
                64 if modality != "audio" else None,
                1000 if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
