"""AMQP 0-9-1 framing + omrabbitmq delivery vs a loopback mini-broker."""

from __future__ import annotations

import socketserver
import struct
import threading

import pytest

from rsyslog_spark import amqp_wire as aw


class MiniBroker:
    """Server side of the 0-9-1 handshake + publish collection."""

    def __init__(self):
        self.published: list[dict] = []
        self.logins: list[bytes] = []
        self.declared: list[tuple[str, str]] = []
        self.lock = threading.Lock()

    def handle(self, sock):
        buf = bytearray()
        hdr = b""
        while len(hdr) < 8:
            chunk = sock.recv(8 - len(hdr))
            if not chunk:
                return
            hdr += chunk
        assert hdr == b"AMQP\x00\x00\x09\x01"
        sock.sendall(
            aw.method_frame(
                0, aw.CONNECTION, aw.CONN_START,
                b"\x00\x09" + aw.field_table({})
                + aw.longstr("PLAIN") + aw.longstr("en_US"),
            )
        )
        start_ok = aw.expect_method(
            sock, buf, aw.CONNECTION, aw.CONN_START_OK
        )
        _props, pos = aw.parse_field_table(start_ok, 0)
        mlen = start_ok[pos]
        pos += 1 + mlen  # mechanism
        (rlen,) = struct.unpack_from(">I", start_ok, pos)
        with self.lock:
            self.logins.append(start_ok[pos + 4:pos + 4 + rlen])
        sock.sendall(
            aw.method_frame(
                0, aw.CONNECTION, aw.CONN_TUNE,
                struct.pack(">HIH", 0, 131072, 0),
            )
        )
        aw.expect_method(sock, buf, aw.CONNECTION, aw.CONN_TUNE_OK)
        aw.expect_method(sock, buf, aw.CONNECTION, aw.CONN_OPEN)
        sock.sendall(
            aw.method_frame(0, aw.CONNECTION, aw.CONN_OPEN_OK, b"\x00")
        )
        aw.expect_method(sock, buf, aw.CHANNEL, aw.CHAN_OPEN)
        sock.sendall(
            aw.method_frame(1, aw.CHANNEL, aw.CHAN_OPEN_OK, aw.longstr(""))
        )
        pending = None
        while True:
            try:
                ftype, _ch, payload = aw.read_frame(sock, buf)
            except (ConnectionError, OSError):
                return
            if ftype == aw.FRAME_METHOD:
                cid, mid = struct.unpack_from(">HH", payload, 0)
                if (cid, mid) == (aw.EXCHANGE, aw.EXCH_DECLARE):
                    p = 4 + 2
                    nl = payload[p]
                    name = payload[p + 1:p + 1 + nl].decode()
                    p += 1 + nl
                    tl = payload[p]
                    etype = payload[p + 1:p + 1 + tl].decode()
                    with self.lock:
                        self.declared.append((name, etype))
                    sock.sendall(
                        aw.method_frame(
                            1, aw.EXCHANGE, aw.EXCH_DECLARE_OK
                        )
                    )
                elif (cid, mid) == (aw.BASIC, aw.BASIC_PUBLISH):
                    p = 4 + 2
                    el = payload[p]
                    exchange = payload[p + 1:p + 1 + el].decode()
                    p += 1 + el
                    rl = payload[p]
                    rkey = payload[p + 1:p + 1 + rl].decode()
                    pending = {
                        "exchange": exchange, "routing_key": rkey,
                        "body": b"",
                    }
            elif ftype == aw.FRAME_HEADER and pending is not None:
                _cls, _w, body_size, flags = struct.unpack_from(
                    ">HHQH", payload, 0
                )
                pending["body_size"] = body_size
                pending["flags"] = flags
                p = 14
                if flags & aw.FLAG_CONTENT_TYPE:
                    ln = payload[p]
                    pending["content_type"] = payload[
                        p + 1:p + 1 + ln
                    ].decode()
                    p += 1 + ln
                if flags & aw.FLAG_HEADERS:
                    pending["headers"], p = aw.parse_field_table(
                        payload, p
                    )
                if flags & aw.FLAG_DELIVERY_MODE:
                    pending["delivery_mode"] = payload[p]
                    p += 1
                if flags & aw.FLAG_TIMESTAMP:
                    (pending["timestamp"],) = struct.unpack_from(
                        ">Q", payload, p
                    )
                    p += 8
                if flags & aw.FLAG_APP_ID:
                    ln = payload[p]
                    pending["app_id"] = payload[p + 1:p + 1 + ln].decode()
                    p += 1 + ln
                if body_size == 0:
                    with self.lock:
                        self.published.append(pending)
                    pending = None
            elif ftype == aw.FRAME_BODY and pending is not None:
                pending["body"] += payload
                if len(pending["body"]) >= pending["body_size"]:
                    with self.lock:
                        self.published.append(pending)
                    pending = None


@pytest.fixture()
def broker():
    mini = MiniBroker()

    class H(socketserver.BaseRequestHandler):
        def handle(self):
            mini.handle(self.request)

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), H)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield mini, srv.server_address[1]
    finally:
        srv.shutdown()


def test_field_table_roundtrip():
    d = {"s": "txt", "b": True, "n": -7, "nested": {"x": "y"}}
    enc = aw.field_table(d)
    got, pos = aw.parse_field_table(enc, 0)
    assert got == d and pos == len(enc)


def test_handshake_and_publish(broker):
    mini, port = broker
    pub = aw.AmqpPublisher(
        "127.0.0.1", port, user="u1", password="p1",
        exchange_declare=("logs", "direct"),
    )
    pub.publish(
        "hello amqp", exchange="logs", routing_key="sev.3",
        content_type="text/plain", delivery_mode=2,
        timestamp=1700000000, app_id="tag:",
        headers={"facility": 4},
    )
    pub.publish(b"", exchange="logs", routing_key="empty")
    pub.close()
    import time
    for _ in range(100):
        with mini.lock:
            if len(mini.published) == 2:
                break
        time.sleep(0.05)
    assert mini.logins == [b"\x00u1\x00p1"]
    assert mini.declared == [("logs", "direct")]
    m1, m2 = mini.published
    assert m1["body"] == b"hello amqp"
    assert m1["routing_key"] == "sev.3"
    assert m1["content_type"] == "text/plain"
    assert m1["delivery_mode"] == 2
    assert m1["timestamp"] == 1700000000
    assert m1["app_id"] == "tag:"
    assert m1["headers"] == {"facility": 4}
    assert m2["body"] == b"" and m2["body_size"] == 0


def test_omrabbitmq_deliver(spark, broker):
    mini, port = broker
    df = spark.createDataFrame(
        [(f"m{i}", f"rk{i % 2}", "prog:") for i in range(10)],
        "value string, rk string, syslogtag string",
    )
    rep = aw.omrabbitmq_deliver(
        df.repartition(2), "127.0.0.1", port,
        exchange="", routing_key_col="rk",
        populate_properties=True,
    ).collect()
    assert sum(r.n_sent for r in rep) == 10
    import time
    for _ in range(100):
        with mini.lock:
            if len(mini.published) == 10:
                break
        time.sleep(0.05)
    with mini.lock:
        bodies = sorted(m["body"] for m in mini.published)
        assert bodies == [f"m{i}".encode() for i in range(10)]
        assert {m["routing_key"] for m in mini.published} == {"rk0", "rk1"}
        assert all(m["app_id"] == "prog:" for m in mini.published)
