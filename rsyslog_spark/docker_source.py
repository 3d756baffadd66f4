"""imdocker: Docker container-log stream demultiplexing.

The Docker attach/logs API multiplexes stdout/stderr into framed
chunks — header ``[STREAM_TYPE, 0, 0, 0, SIZE_be32]`` then SIZE
payload bytes (contrib/imdocker/imdocker.c:1415-1436). No Docker
daemon runs in the sandbox, so the HTTP/unix-socket fetch is a seam;
the demux + message shaping — the module's actual logic — is real and
distributed (mapInPandas over binary chunk columns).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOCKER_TAG = "docker:"
STREAM_STDIN, STREAM_STDOUT, STREAM_STDERR = 0, 1, 2
LOG_ERR = 3


def docker_stream_demux(data: bytes) -> list[tuple[int, bytes]]:
    """One multiplexed byte stream → [(stream_type, payload)].
    Truncated trailing frames are dropped (a live reader would keep
    them as the continuation buffer, imdocker.c:1458-1500); an
    invalid stream type stops the parse — the reference aborts the
    transfer there."""
    frames: list[tuple[int, bytes]] = []
    i, n = 0, len(data)
    while i + 8 <= n:
        st = data[i]
        if st > STREAM_STDERR:
            break
        (size,) = struct.unpack_from(">I", data, i + 4)
        if i + 8 + size > n:
            break
        frames.append((st, data[i + 8:i + 8 + size]))
        i += 8 + size
    return frames


def frames_to_messages(
    frames: list[tuple[int, bytes]]
) -> list[tuple[int, str]]:
    """Per-stream reassembly then newline split: payload bytes of the
    same stream concatenate, each '\\n'-terminated run is one message
    (the reference submits on the eol check, imdocker.c:1487-1494)."""
    bufs: dict[int, bytearray] = {}
    out: list[tuple[int, str]] = []
    for st, payload in frames:
        buf = bufs.setdefault(st, bytearray())
        buf.extend(payload)
        while True:
            nl = buf.find(b"\n")
            if nl == -1:
                break
            out.append(
                (st, buf[:nl].decode("utf-8", "replace"))
            )
            del buf[:nl + 1]
    for st, buf in sorted(bufs.items()):
        if buf:  # unterminated tail still ships at stream end
            out.append((st, bytes(buf).decode("utf-8", "replace")))
    return out


def docker_container_logs(
    df: DataFrame,
    blob_col: str = "chunk",
    container_col: str = "container_id",
    dflt_severity: int = 5,
    dflt_facility: int = 1,
) -> DataFrame:
    """DataFrame of (container_id, multiplexed binary chunk) →
    one row per log message with imdocker's property mapping:
    TAG 'docker:', severity LOG_ERR for stderr frames else the
    configured default (imdocker.c:1319), facility from config,
    stream type retained. Partition-parallel demux."""
    import pandas as pd

    def demux(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for cid, blob in zip(
                pdf[container_col], pdf[blob_col]
            ):
                data = bytes(blob) if blob is not None else b""
                for st, msg in frames_to_messages(
                    docker_stream_demux(data)
                ):
                    rows.append((cid, st, msg))
            out = pd.DataFrame(
                rows, columns=["container_id", "stream_type", "msg"]
            )
            yield out

    shaped = df.mapInPandas(
        demux, "container_id string, stream_type int, msg string"
    )
    return (
        shaped.withColumn("syslogtag", F.lit(DOCKER_TAG))
        .withColumn(
            "severity",
            F.when(
                F.col("stream_type") == STREAM_STDERR, F.lit(LOG_ERR)
            ).otherwise(F.lit(dflt_severity)).cast("long"),
        )
        .withColumn("facility", F.lit(dflt_facility).cast("long"))
    )


def mux_frames(frames: list[tuple[int, bytes]]) -> bytes:
    """Inverse of the demux (test helper / omstdout-style fake
    daemon): frame each payload with the 8-byte header."""
    return b"".join(
        bytes([st, 0, 0, 0]) + struct.pack(">I", len(p)) + p
        for st, p in frames
    )
