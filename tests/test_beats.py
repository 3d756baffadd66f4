"""imbeats / Lumberjack v2: frame round trips, the reference's
whole-batch validation semantics, zip-bomb guards, and the
socket→spool→Spark bridge."""

import json
import socket
import struct
import time
import zlib

import pytest

from rsyslog_spark.beats import (
    BeatsListener,
    LumberjackError,
    LumberjackParser,
    beats_spool_columns,
    lumberjack_window,
    parse_ack,
)


def _events(n, start=0):
    return [{"message": f"m{i}", "n": i} for i in range(start, start + n)]


def test_plain_window_round_trip_and_ack():
    p = LumberjackParser()
    out = p.feed(lumberjack_window(_events(3), seq_start=1))
    assert len(out) == 1
    batch, ack = out[0]
    assert [e["seq"] for e in batch] == [1, 2, 3]
    assert [e["event"]["message"] for e in batch] == ["m0", "m1", "m2"]
    assert parse_ack(ack) == 3
    # next window continues the sequence
    out2 = p.feed(lumberjack_window(_events(2), seq_start=4))
    assert parse_ack(out2[0][1]) == 5


def test_compressed_window_and_byte_at_a_time_feed():
    p = LumberjackParser()
    wire = lumberjack_window(_events(5), seq_start=1, compress=True)
    outs = []
    for i in range(len(wire)):  # worst-case TCP fragmentation
        outs += p.feed(wire[i:i + 1])
    assert len(outs) == 1
    batch, ack = outs[0]
    assert len(batch) == 5 and parse_ack(ack) == 5


def test_batch_rejected_as_a_whole_on_late_bad_event():
    """imbeats.c:789-815 — validation happens before ANY submit, so a
    bad last event poisons the entire window and nothing is acked."""
    good = json.dumps({"ok": 1}).encode()
    frames = (
        bytes([ord("2"), ord("J")]) + struct.pack(">II", 1, len(good)) + good
        + bytes([ord("2"), ord("J")]) + struct.pack(">II", 2, 7) + b"[1,2,3]"
    )  # second event is a JSON ARRAY, not an object
    wire = bytes([ord("2"), ord("W")]) + struct.pack(">I", 2) + frames
    p = LumberjackParser()
    with pytest.raises(LumberjackError, match="not a JSON object"):
        p.feed(wire)
    assert p.last_acked_seq == 0


def test_sequence_gap_rejected_and_uint32_wraparound_accepted():
    p = LumberjackParser()
    with pytest.raises(LumberjackError, match="seq"):
        p.feed(lumberjack_window(_events(2), seq_start=5))
    p2 = LumberjackParser()
    p2.last_acked_seq = 0xFFFFFFFF - 1
    out = p2.feed(lumberjack_window(_events(3), seq_start=0xFFFFFFFF))
    # 4294967295 -> 0 -> 1 (seqnum.h uint32 wrap)
    assert [e["seq"] for e in out[0][0]] == [0xFFFFFFFF, 0, 1]
    assert parse_ack(out[0][1]) == 1


def test_protocol_violations():
    # first frame must be a window
    with pytest.raises(LumberjackError, match="2W"):
        LumberjackParser().feed(b"2J" + b"\x00" * 8)
    # zero window size
    with pytest.raises(LumberjackError, match="window size 0"):
        LumberjackParser().feed(b"2W\x00\x00\x00\x00")
    # zero-length json frame
    with pytest.raises(LumberjackError, match="len 0"):
        LumberjackParser().feed(
            b"2W\x00\x00\x00\x01" + b"2J" + struct.pack(">II", 1, 0)
        )
    # nested 2C inside 2C is invalid (lj_parser.c:217-222)
    inner = zlib.compress(b"2J" + struct.pack(">II", 1, 2) + b"{}")
    nested = b"2C" + struct.pack(">I", len(inner)) + inner
    z = zlib.compress(nested)
    wire = (b"2W\x00\x00\x00\x01" + b"2C" + struct.pack(">I", len(z)) + z)
    with pytest.raises(LumberjackError, match="inner frame type"):
        LumberjackParser().feed(wire)
    # empty deflate stream
    z0 = zlib.compress(b"")
    with pytest.raises(LumberjackError, match="empty deflate"):
        LumberjackParser().feed(
            b"2W\x00\x00\x00\x01" + b"2C" + struct.pack(">I", len(z0)) + z0
        )
    # trailing garbage after the event JSON
    bad = b'{"a":1} x'
    with pytest.raises(LumberjackError, match="trailing"):
        LumberjackParser().feed(
            b"2W\x00\x00\x00\x01" + b"2J"
            + struct.pack(">II", 1, len(bad)) + bad
        )
    # more frames than the window promised
    ev = b'{"a":1}'
    fr = b"2J" + struct.pack(">II", 1, len(ev)) + ev
    fr2 = b"2J" + struct.pack(">II", 2, len(ev)) + ev
    z2 = zlib.compress(fr + fr2)
    with pytest.raises(LumberjackError, match="more frames"):
        LumberjackParser().feed(
            b"2W\x00\x00\x00\x01" + b"2C" + struct.pack(">I", len(z2)) + z2
        )


def test_zip_bomb_guard():
    bomb = zlib.compress(b"\x00" * (1 << 22))  # 4 MiB of zeros, tiny wire
    wire = (
        b"2W\x00\x00\x00\x01" + b"2C" + struct.pack(">I", len(bomb)) + bomb
    )
    p = LumberjackParser(max_compression_ratio=10,
                         max_decompressed_size=1 << 30)
    with pytest.raises(LumberjackError, match="over limit|truncated"):
        p.feed(wire)


def test_listener_socket_round_trip_and_spark_bridge(spark, tmp_path):
    spool = str(tmp_path / "beats_spool")
    lst = BeatsListener(spool)
    try:
        with socket.create_connection(("127.0.0.1", lst.port)) as c:
            c.sendall(lumberjack_window(_events(4), seq_start=1))
            assert parse_ack(c.recv(6)) == 4
            c.sendall(lumberjack_window(
                _events(3, start=4), seq_start=5, compress=True))
            assert parse_ack(c.recv(6)) == 7
        deadline = time.time() + 5
        while lst.n_events < 7 and time.time() < deadline:
            time.sleep(0.05)
        assert lst.n_events == 7 and lst.n_batches == 2

        df = spark.read.text(spool)
        out = df.select(beats_spool_columns(df["value"])).orderBy(
            "beats_seq"
        )
        rows = out.collect()
        assert [r.beats_seq for r in rows] == [1, 2, 3, 4, 5, 6, 7]
        assert rows[0].msg == "m0" and rows[6].msg == "m6"
        assert rows[0].protocol == "lumberjack-v2"
        assert rows[0].peer_ip == "127.0.0.1"
        assert json.loads(rows[3].beats_event) == {"message": "m3", "n": 3}
    finally:
        lst.close()


def test_listener_aborts_bad_session_keeps_good_one(tmp_path):
    spool = str(tmp_path / "beats_spool2")
    lst = BeatsListener(spool)
    try:
        # bad session: first frame not a window — server closes, no ack
        with socket.create_connection(("127.0.0.1", lst.port)) as c:
            c.sendall(b"2J" + struct.pack(">II", 1, 2) + b"{}")
            assert c.recv(6) == b""  # peer closed without acking
        # fresh session still works (per-session parser state)
        with socket.create_connection(("127.0.0.1", lst.port)) as c:
            c.sendall(lumberjack_window(_events(2), seq_start=1))
            assert parse_ack(c.recv(6)) == 2
    finally:
        lst.close()
