"""ZMTP 3.0 + omczmq/imczmq loopback round-trips."""

from __future__ import annotations

import socket
import threading

import pytest

from rsyslog_spark import zmtp_wire as zw


def _listener():
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    srv.settimeout(15.0)
    return srv, srv.getsockname()[1]


def test_ready_roundtrip():
    body = zw.ready_command("PUSH", Identity="abc")
    meta = zw.parse_ready(body)
    assert meta == {"Socket-Type": "PUSH", "Identity": "abc"}


def test_handshake_and_multipart():
    srv, port = _listener()
    out = {}

    def peer():
        conn, _ = srv.accept()
        z = zw.ZmtpSocket(conn, "PULL", as_server=True)
        out["m1"] = z.recv_multipart()
        out["m2"] = z.recv_multipart()
        z.close()

    t = threading.Thread(target=peer, daemon=True)
    t.start()
    c = zw.ZmtpSocket(
        socket.create_connection(("127.0.0.1", port)), "PUSH"
    )
    c.send_multipart([b"topic", b"hello"])
    c.send_multipart([b"x" * 1000])  # long frame
    c.close()
    t.join(timeout=10)
    srv.close()
    assert out["m1"] == [b"topic", b"hello"]
    assert out["m2"] == [b"x" * 1000]


def test_socket_type_compat_rejected():
    srv, port = _listener()

    def peer():
        conn, _ = srv.accept()
        try:
            zw.ZmtpSocket(conn, "SUB", as_server=True)
        except ValueError:
            pass

    t = threading.Thread(target=peer, daemon=True)
    t.start()
    with pytest.raises(ValueError, match="incompatible"):
        zw.ZmtpSocket(
            socket.create_connection(("127.0.0.1", port)), "PUSH"
        )
    t.join(timeout=10)
    srv.close()


def test_omczmq_parts_shaping():
    assert zw.omczmq_parts("m", "PUSH", topic="t") == [b"m"]
    assert zw.omczmq_parts("m", "PUB", topic="t", topic_frame=True) == [
        b"t", b"m"
    ]
    # topicFrame=false concatenates in ONE frame (omczmq.c:260-263)
    assert zw.omczmq_parts("m", "PUB", topic="t", topic_frame=False) == [
        b"tm"
    ]


def test_push_pull_spark_roundtrip(spark):
    srv, port = _listener()
    result = {}

    def peer():
        result["df_rows"] = zw.imczmq_pull(
            spark, srv, socket_type="PULL", max_messages=8
        ).collect()

    t = threading.Thread(target=peer, daemon=True)
    t.start()
    df = spark.createDataFrame(
        [(f"msg-{i}",) for i in range(8)], "value string"
    )
    rep = zw.omczmq_deliver(
        df.coalesce(1), "127.0.0.1", port, socket_type="PUSH"
    ).collect()
    t.join(timeout=30)
    srv.close()
    assert rep[0].n_sent == 8
    got = sorted(r.value for r in result["df_rows"])
    assert got == [f"msg-{i}" for i in range(8)]
    assert all(r.topic == "" for r in result["df_rows"])


def test_pub_sub_topic_filter(spark):
    srv, port = _listener()
    result = {}

    def peer():
        result["rows"] = zw.imczmq_pull(
            spark, srv, socket_type="SUB", max_messages=2,
            topics=["sev3."],
        ).collect()

    t = threading.Thread(target=peer, daemon=True)
    t.start()
    df = spark.createDataFrame(
        [("a", "sev3."), ("b", "sev7."), ("c", "sev3."), ("d", "other.")],
        "value string, topic string",
    )
    zw.omczmq_deliver(
        df.coalesce(1), "127.0.0.1", port, socket_type="PUB",
        topic_col="topic", topic_frame=True,
    ).collect()
    t.join(timeout=30)
    srv.close()
    rows = sorted((r.topic, r.value) for r in result["rows"])
    assert rows == [("sev3.", "a"), ("sev3.", "c")]
