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


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform frame sampling over video rows: each video becomes
    n_frames (media_id, frame_idx, ts_ms, frame_payload) rows.

    The ffmpeg seek+decode is STUBBED (no codecs in this container):
    the fake 'frame' is a deterministic slice of the payload. The
    Spark-side contract is the real one — partition-preserving
    mapInPandas, one output row per sampled frame, timestamps spread
    uniformly over duration_ms — so a real decoder drops into
    `_fake_frame` only."""

    def _fake_frame(payload: bytes, idx: int) -> bytes:
        if not payload:
            return b""
        start = (idx * 7) % max(1, len(payload))
        return payload[start:] + payload[:start]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, modality, payload, dur in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"],
                pdf["duration_ms"],
            ):
                if modality != "video":
                    continue
                d = int(dur) if dur is not None and not pd.isna(dur) else 0
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append((d * i) // n_frames)
                    frames.append(_fake_frame(payload, i))
            yield pd.DataFrame(
                {
                    "media_id": ids, "frame_idx": idxs,
                    "ts_ms": tss, "frame_payload": frames,
                }
            )

    return df.mapInPandas(sample, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: image rows → (media_id, width, height,
    payload) at the target size. The PIL decode/resample is STUBBED
    (deterministic byte fold to width*height//64 bytes) — batch shape,
    schema, and the filter-before-decode ordering are the real
    contract."""

    def _fake_resize(payload: bytes) -> bytes:
        n = max(1, (width * height) // 64)
        if not payload:
            return bytes(n)
        return bytes((payload[i % len(payload)] + i) % 256 for i in range(n))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["modality"] == "image"
            sub = pdf[mask]
            yield pd.DataFrame(
                {
                    "media_id": sub["media_id"],
                    "width": width,
                    "height": height,
                    "payload": [_fake_resize(p) for p in sub["payload"]],
                }
            )

    return df.mapInPandas(resize, RESIZED_SCHEMA)


def mmexternal(
    df: DataFrame,
    binary: list[str],
    input_prop: str = "msg",
    out_col: str = "external",
) -> DataFrame:
    """plugins/mmexternal/mmexternal.c — REAL external-process message
    modification: one long-lived child per partition (the reference
    keeps one per worker thread, mmexternal.c:callExtProg), one input
    LINE per message on stdin (interface.input = msg | rawmsg |
    fulljson, mmexternal.c:738-774), one JSON reply line per message on
    stdout (processProgramReply:319-405), returned RAW in `out_col`
    (StringType). Parsing the reply (`F.from_json(out_col, ...)`) and
    the MsgSetPropsViaJSON merge are the caller's promotion step (see
    parsing.devices.pmnormalize for the promotion recipe) — the reply
    schema is the child program's contract, not ours.

    The per-message round-trip is synchronous like the reference;
    batching amortizes the process spawn across the whole partition."""
    import json as _json
    import subprocess

    if input_prop not in ("msg", "rawmsg", "fulljson"):
        raise ValueError("interface.input must be msg|rawmsg|fulljson")

    in_schema = df.schema
    out_schema = StructType(
        list(in_schema.fields)
        + [StructField(out_col, StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proc = subprocess.Popen(
            binary, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1,
        )
        try:
            for pdf in batches:
                replies = []
                for _, row in pdf.iterrows():
                    if input_prop == "fulljson":
                        line = _json.dumps(
                            {k: (None if pd.isna(v) else v)
                             for k, v in row.items()
                             if isinstance(v, (str, int, float, bool))
                             or v is None},
                            default=str,
                        )
                    else:
                        line = str(row.get(input_prop, "") or "")
                    proc.stdin.write(line.replace("\n", " ") + "\n")
                    proc.stdin.flush()
                    replies.append(proc.stdout.readline().rstrip("\n"))
                out = pdf.copy()
                out[out_col] = replies
                yield out
        finally:
            proc.stdin.close()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                # child ignored stdin EOF: kill it rather than failing
                # the whole partition task (rows are already yielded)
                proc.kill()
                proc.wait()

    return df.mapInPandas(run, out_schema)
