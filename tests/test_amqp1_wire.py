"""AMQP 1.0: typed-encoding round trips, omamqp1/omazureeventhubs
message shapes, and the open/begin/attach/flow/transfer/disposition
conversation against a loopback mini-broker."""

import socket
import struct
import threading

import pytest

from rsyslog_spark.amqp1_wire import (
    AMQP_VALUE,
    APP_PROPERTIES,
    Amqp1Sender,
    Binary,
    DATA,
    Described,
    P_ATTACH,
    P_BEGIN,
    P_CLOSE,
    P_OPEN,
    P_TRANSFER,
    PROTO_HEADER,
    Symbol,
    Timestamp,
    UInt,
    ULong,
    _begin,
    _disposition,
    _flow,
    _open,
    decode_message,
    decode_value,
    encode_value,
    frame,
    omamqp1_message,
    omazure_message,
    read_frame,
)


def test_primitive_round_trips():
    vals = [
        None, True, False, 0, -1, 127, -128, 1 << 40, -(1 << 40),
        "héllo", "x" * 300, Symbol("application/octet-stream"),
        Binary(b"\x00\xff" * 10), Binary(b"b" * 300),
        UInt(0), UInt(7), UInt(70000), ULong(0), ULong(9), ULong(1 << 40),
        Timestamp(1700000000000),
        [], [1, "a", [None, True]], {"k": "v", "n": 3},
        Described(0x77, ["a", "b"]),
    ]
    for v in vals:
        enc = encode_value(v)
        got, off = decode_value(enc)
        assert off == len(enc)
        assert got == v
        assert type(got) is type(v) or isinstance(v, (list, dict))


def test_known_encodings():
    assert encode_value(None) == b"\x40"
    assert encode_value(UInt(0)) == b"\x43"
    assert encode_value(UInt(5)) == b"\x52\x05"
    assert encode_value(ULong(0x77)) == b"\x53\x77"
    assert encode_value("ab") == b"\xa1\x02ab"
    assert encode_value(Symbol("a")) == b"\xa3\x01a"
    assert encode_value([]) == b"\x45"
    assert encode_value(Timestamp(0)) == b"\x83" + b"\x00" * 8
    # described value = 0x00 + descriptor + value
    assert encode_value(Described(0x77, None)) == b"\x00\x53\x77\x40"


def test_omamqp1_and_omazure_message_shapes():
    m = decode_message(omamqp1_message(["line one", "line two"]))
    assert m["amqp_value"] == ["line one", "line two"]

    enc = omazure_message(
        b"payload-bytes", "msg-42", 1700000000000, {"env": "prod"}
    )
    m = decode_message(enc)
    assert m["data"] == b"payload-bytes"
    assert m["application_properties"] == {"env": "prod"}
    props = m["properties"]
    assert props[0] == "msg-42"
    assert props[6] == Symbol("application/octet-stream")
    assert props[9] == Timestamp(1700000000000)


class MiniBroker:
    """Loopback AMQP 1.0 accepting endpoint: header exchange, open/
    begin/attach mirror, initial flow credit, accepting disposition
    per transfer."""

    def __init__(self, credit: int = 2):
        self.credit = credit
        self.messages = []
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        conn, _ = self.srv.accept()
        with conn:
            buf = bytearray()
            hdr = b""
            while len(hdr) < 8:
                hdr += conn.recv(8 - len(hdr))
            assert hdr == PROTO_HEADER
            conn.sendall(PROTO_HEADER)
            next_in = 0
            remaining = self.credit
            while True:
                got = read_frame(conn, buf)
                if got is None:
                    return
                _, perf, payload = got
                if perf is None:
                    continue
                if perf.descriptor == P_OPEN:
                    conn.sendall(frame(0, _open("mini-broker")))
                elif perf.descriptor == P_BEGIN:
                    conn.sendall(frame(0, _begin()))
                elif perf.descriptor == P_ATTACH:
                    name, handle = perf.value[0], int(perf.value[1])
                    conn.sendall(frame(0, Described(P_ATTACH, [
                        name, UInt(handle), True,
                    ])))
                    conn.sendall(frame(0, _flow(
                        0, 2048, 0, 2048, handle=handle,
                        credit=self.credit,
                    )))
                elif perf.descriptor == P_TRANSFER:
                    did = int(perf.value[1])
                    self.messages.append(decode_message(payload))
                    next_in += 1
                    remaining -= 1
                    conn.sendall(frame(0, _disposition(did)))
                    if remaining <= 0:
                        conn.sendall(frame(0, _flow(
                            next_in, 2048, 0, 2048, handle=0,
                            credit=self.credit,
                        )))
                        remaining = self.credit
                elif perf.descriptor == P_CLOSE:
                    conn.sendall(frame(0, Described(P_CLOSE, [])))
                    return

    def close(self):
        self.srv.close()


def test_sender_round_trip_with_credit_refresh():
    broker = MiniBroker(credit=2)  # forces a mid-stream flow refresh
    try:
        s = Amqp1Sender("127.0.0.1", broker.port, target="logs")
        assert s.credit == 2
        for i in range(5):
            s.send_message(omamqp1_message([f"m{i}", f"extra{i}"]))
        s.close()
        assert len(broker.messages) == 5
        assert broker.messages[0]["amqp_value"] == ["m0", "extra0"]
        assert broker.messages[4]["amqp_value"] == ["m4", "extra4"]
        # azure shape over the same transport
        b2 = MiniBroker(credit=10)
        s2 = Amqp1Sender("127.0.0.1", b2.port, target="hub")
        s2.send_message(omazure_message(b"evt", "id-1", 123456789))
        s2.close()
        assert b2.messages[0]["data"] == b"evt"
        assert b2.messages[0]["properties"][0] == "id-1"
        b2.close()
    finally:
        broker.close()


def test_frame_layer():
    # frame header: size, doff=2, type=0, channel
    f = frame(7, _open("c"))
    size, doff, ftype, chan = struct.unpack_from(">IBBH", f, 0)
    assert size == len(f) and doff == 2 and ftype == 0 and chan == 7
    perf, off = decode_value(f[8:], 0)
    assert perf.descriptor == P_OPEN and perf.value == ["c"]


def test_omamqp1_deliver_batches(spark):
    from rsyslog_spark.amqp1_wire import omamqp1_deliver

    broker = MiniBroker(credit=100)
    try:
        df = spark.createDataFrame(
            [(i, f"line-{i}") for i in range(7)], "id long, value string"
        ).repartition(1)
        out = omamqp1_deliver(
            df, "127.0.0.1", broker.port, target="logs",
            batch_size=3,
        ).collect()
        assert sum(r.n_lines for r in out) == 7
        assert sum(r.n_messages for r in out) == 3  # 3+3+1
        lines = sorted(
            ln for m in broker.messages for ln in m["amqp_value"]
        )
        assert lines == sorted(f"line-{i}" for i in range(7))
        sizes = sorted(len(m["amqp_value"]) for m in broker.messages)
        assert sizes == [1, 3, 3]
    finally:
        broker.close()
