"""Kafka wire protocol: record batches + produce framing, from spec.

The reference's omkafka/imkafka delegate the wire format to librdkafka
(plugins/omkafka/omkafka.c:41); this module implements the same
on-the-wire artifacts directly from the PUBLIC Apache Kafka protocol
specification (KIP-98 record batch v2; the Kafka protocol guide's
Produce API), so the engine's Kafka story is real bytes, not just
payload shaping:

* :func:`encode_record_batch` / :func:`decode_record_batch` — the v2
  ("magic 2") record batch: 61-byte header (CRC32C over the
  attributes..records span), zigzag-varint record framing, per-record
  headers, timestamp/offset deltas.
* :func:`produce_request` / :func:`parse_produce_response` — Produce
  v7 request/response framing (flexible versions not used — v7 is the
  highest non-flexible version, simplest stable wire image).
* :func:`crc32c` — Castagnoli CRC (table-driven), validated against
  the published check value crc32c(b"123456789") = 0xE3069283.

No broker runs in this sandbox, so delivery stops at the socket seam:
:func:`omkafka_batches` turns a DataFrame into ready-to-send produce
request bytes per (topic, partition) — a deploy points them at a real
broker with plain TCP. Decoding exists for the imkafka direction:
record batches read back into rows byte-identically (round-trip
asserted in tests).
"""

from __future__ import annotations

import struct

__all__ = [
    "crc32c",
    "encode_varint",
    "decode_varint",
    "encode_record_batch",
    "decode_record_batch",
    "produce_request",
    "parse_produce_response",
    "omkafka_batches",
]

# --- CRC32C (Castagnoli, reflected, poly 0x1EDC6F41) -------------------------

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# --- zigzag varints (protobuf encoding, per the Kafka record spec) -----------

def encode_varint(v: int) -> bytes:
    """Signed zigzag varint."""
    z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """→ (value, new_pos)."""
    z, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _vbytes(b: bytes | None) -> bytes:
    if b is None:
        return encode_varint(-1)
    return encode_varint(len(b)) + b


# --- record batch v2 (KIP-98) ------------------------------------------------

def _encode_record(
    offset_delta: int,
    ts_delta: int,
    key: bytes | None,
    value: bytes | None,
    headers: list[tuple[str, bytes | None]] | None = None,
) -> bytes:
    headers = headers or []
    body = (
        b"\x00"  # record attributes (unused)
        + encode_varint(ts_delta)
        + encode_varint(offset_delta)
        + _vbytes(key)
        + _vbytes(value)
        + encode_varint(len(headers))
    )
    for hk, hv in headers:
        kb = hk.encode("utf-8")
        body += encode_varint(len(kb)) + kb + _vbytes(hv)
    return encode_varint(len(body)) + body


def encode_record_batch(
    records: list[tuple],
    base_offset: int = 0,
    base_timestamp_ms: int = 0,
    producer_id: int = -1,
) -> bytes:
    """``records``: (key|None, value|None[, headers[, ts_ms]]) tuples
    → one magic-2 record batch. Layout (Kafka protocol spec):

        baseOffset:int64 batchLength:int32 partitionLeaderEpoch:int32
        magic:int8 crc:uint32 attributes:int16 lastOffsetDelta:int32
        baseTimestamp:int64 maxTimestamp:int64 producerId:int64
        producerEpoch:int16 baseSequence:int32 recordCount:int32
        records...

    The CRC is CRC32C over everything AFTER the crc field."""
    if not records:
        raise ValueError("a record batch needs at least one record")
    recs = b""
    max_ts = base_timestamp_ms
    for i, r in enumerate(records):
        key, value = r[0], r[1]
        headers = r[2] if len(r) > 2 else []
        ts = r[3] if len(r) > 3 else base_timestamp_ms
        max_ts = max(max_ts, ts)
        recs += _encode_record(i, ts - base_timestamp_ms, key, value, headers)
    after_crc = (
        struct.pack(
            ">hiqqqhii",
            0,                      # attributes: no compression
            len(records) - 1,       # lastOffsetDelta
            base_timestamp_ms,
            max_ts,
            producer_id,
            -1,                     # producerEpoch
            -1,                     # baseSequence
            len(records),
        )
        + recs
    )
    crc = crc32c(after_crc)
    body = struct.pack(">iBI", -1, 2, crc) + after_crc
    # batchLength counts from partitionLeaderEpoch (i.e. body)
    return struct.pack(">qi", base_offset, len(body)) + body


def decode_record_batch(buf: bytes) -> dict:
    """Inverse of :func:`encode_record_batch` (the imkafka direction).
    Verifies magic and CRC; returns {base_offset, base_timestamp_ms,
    records: [(key, value, headers, ts_ms)], ...}."""
    base_offset, batch_len = struct.unpack_from(">qi", buf, 0)
    ple, magic, crc = struct.unpack_from(">iBI", buf, 12)
    if magic != 2:
        raise ValueError(f"unsupported record batch magic {magic}")
    after_crc = buf[21 : 12 + batch_len]
    if crc32c(after_crc) != crc:
        raise ValueError("record batch CRC32C mismatch")
    (attrs, last_delta, base_ts, max_ts, pid, pepoch, bseq,
     count) = struct.unpack_from(">hiqqqhii", after_crc, 0)
    if attrs & 0x07:
        raise ValueError("compressed batches not supported")
    pos = struct.calcsize(">hiqqqhii")
    records = []
    for _ in range(count):
        rec_len, pos = decode_varint(after_crc, pos)
        end = pos + rec_len
        pos += 1  # record attributes
        ts_delta, pos = decode_varint(after_crc, pos)
        _off_delta, pos = decode_varint(after_crc, pos)
        klen, pos = decode_varint(after_crc, pos)
        key = None if klen < 0 else after_crc[pos : pos + klen]
        pos += max(0, klen)
        vlen, pos = decode_varint(after_crc, pos)
        value = None if vlen < 0 else after_crc[pos : pos + vlen]
        pos += max(0, vlen)
        nh, pos = decode_varint(after_crc, pos)
        headers = []
        for _h in range(nh):
            hklen, pos = decode_varint(after_crc, pos)
            hk = after_crc[pos : pos + hklen].decode("utf-8")
            pos += hklen
            hvlen, pos = decode_varint(after_crc, pos)
            hv = None if hvlen < 0 else after_crc[pos : pos + hvlen]
            pos += max(0, hvlen)
            headers.append((hk, hv))
        records.append((key, value, headers, base_ts + ts_delta))
        pos = end
    return {
        "base_offset": base_offset,
        "base_timestamp_ms": base_ts,
        "max_timestamp_ms": max_ts,
        "producer_id": pid,
        "records": records,
    }


# --- Produce API framing (v7, non-flexible) ----------------------------------

def _kstr(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def produce_request(
    topic: str,
    partition: int,
    batch: bytes,
    correlation_id: int = 1,
    client_id: str = "rsyslog-spark",
    acks: int = -1,
    timeout_ms: int = 30000,
    transactional_id: str | None = None,
) -> bytes:
    """Produce v7 request with ONE topic+partition's record batch,
    length-prefixed for the wire (send as-is over TCP)."""
    body = (
        _kstr(transactional_id)
        + struct.pack(">hi", acks, timeout_ms)
        + struct.pack(">i", 1)          # one topic
        + _kstr(topic)
        + struct.pack(">i", 1)          # one partition
        + struct.pack(">i", partition)
        + struct.pack(">i", len(batch))
        + batch
    )
    header = struct.pack(">hhi", 0, 7, correlation_id) + _kstr(client_id)
    msg = header + body
    return struct.pack(">i", len(msg)) + msg


def parse_produce_response(buf: bytes) -> dict:
    """Produce v7 response → {correlation_id, topic, partition,
    error_code, base_offset, log_append_time_ms} (single topic+
    partition, matching :func:`produce_request`)."""
    size = struct.unpack_from(">i", buf, 0)[0]
    pos = 4
    corr = struct.unpack_from(">i", buf, pos)[0]
    pos += 4
    n_topics = struct.unpack_from(">i", buf, pos)[0]
    pos += 4
    if n_topics != 1:
        raise ValueError("expected a single-topic response")
    tlen = struct.unpack_from(">h", buf, pos)[0]
    pos += 2
    topic = buf[pos : pos + tlen].decode("utf-8")
    pos += tlen
    _n_parts = struct.unpack_from(">i", buf, pos)[0]
    pos += 4
    (partition, error_code, base_offset, log_append,
     _log_start) = struct.unpack_from(">ihqqq", buf, pos)
    return {
        "size": size,
        "correlation_id": corr,
        "topic": topic,
        "partition": partition,
        "error_code": error_code,
        "base_offset": base_offset,
        "log_append_time_ms": log_append,
    }


def omkafka_batches(
    df,
    topic: str,
    value_col: str = "value",
    key_col: str | None = None,
    partition_expr=None,
    n_partitions: int = 1,
    max_records: int = 500,
):
    """DataFrame rows → ready-to-send Produce request frames, one per
    (kafka partition, ≤max_records chunk): (partition int, n_records
    int, request binary). omkafka's partitioning knobs map to
    ``partition_expr`` (default: hash of key or round-robin-by-chunk
    like librdkafka's default partitioner). Executor-side mapInPandas;
    a deploy sends each frame over TCP to the partition leader —
    delivery is the only broker-blocked step in this sandbox."""
    import pandas as pd
    from pyspark.sql import functions as F

    cols = [F.col(value_col).alias("_v")]
    if key_col:
        cols.append(F.col(key_col).alias("_k"))
    if partition_expr is not None:
        part = partition_expr
    elif key_col:
        part = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_partitions))
    else:
        part = F.pmod(F.spark_partition_id(), F.lit(n_partitions))
    prepared = df.select(*cols, part.cast("int").alias("_p"))

    def build(batches):
        corr = 0
        for pdf in batches:
            out_p, out_n, out_req = [], [], []
            for p, sub in pdf.groupby("_p"):
                vals = sub["_v"].tolist()
                keys = (
                    sub["_k"].tolist() if "_k" in sub.columns
                    else [None] * len(vals)
                )
                for off in range(0, len(vals), max_records):
                    recs = []
                    for k, v in zip(
                        keys[off : off + max_records],
                        vals[off : off + max_records],
                    ):
                        kb = (
                            k.encode("utf-8")
                            if isinstance(k, str) else k
                        )
                        vb = (
                            v.encode("utf-8")
                            if isinstance(v, str) else v
                        )
                        recs.append((kb, vb))
                    corr += 1
                    out_p.append(int(p))
                    out_n.append(len(recs))
                    out_req.append(
                        produce_request(
                            topic, int(p),
                            encode_record_batch(recs),
                            correlation_id=corr,
                        )
                    )
            yield pd.DataFrame(
                {"partition": out_p, "n_records": out_n,
                 "request": out_req}
            )

    return prepared.mapInPandas(
        build, "partition int, n_records int, request binary"
    )
