"""ommongodb: BSON round trips, the reference's document shapes,
OP_MSG framing, and insert delivery against a loopback mini-mongod."""

import socket
import struct
import threading

import pytest

from rsyslog_spark.mongo_wire import (
    Int64,
    MongoInserter,
    ObjectId,
    UTCDateTime,
    decode_document,
    default_doc,
    encode_document,
    lumberjack_level,
    ommongodb_deliver,
    op_msg,
    read_op_msg,
    template_doc,
)


def test_bson_known_answer_and_round_trip():
    # canonical bsonspec.org example: {"hello": "world"}
    assert encode_document({"hello": "world"}) == (
        b"\x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00"
    )
    doc = {
        "s": "x", "i": 5, "big": 1 << 40, "f": 1.5, "b": True,
        "none": None, "sub": {"a": 1}, "arr": [1, "two"],
        "oid": ObjectId(b"\x01" * 12), "dt": UTCDateTime(1700000000000),
        "i64": Int64(7), "bin": b"\x00\xff",
    }
    got, off = decode_document(encode_document(doc))
    assert off == len(encode_document(doc))
    assert got["s"] == "x" and got["i"] == 5 and got["big"] == 1 << 40
    assert got["arr"] == [1, "two"]        # true array type round-trips
    assert got["oid"] == ObjectId(b"\x01" * 12)
    assert got["dt"] == UTCDateTime(1700000000000)
    assert isinstance(got["i64"], Int64) and got["i64"] == 7
    assert got["bin"] == b"\x00\xff"
    # int32/int64 narrowing boundary
    enc31 = encode_document({"v": (1 << 31) - 1})
    enc32 = encode_document({"v": 1 << 31})
    assert enc31[4] == 0x10 and enc32[4] == 0x12


def test_lumberjack_levels_and_default_doc():
    assert [lumberjack_level(s) for s in range(9)] == [
        "FATAL", "ERROR", "ERROR", "ERROR", "WARN", "INFO", "INFO",
        "DEBUG", "INVLD",
    ]
    d = default_doc(
        ObjectId(b"\x02" * 12), "h1", 1000, 2000, "boot", 4, 2,
        "sshd[9]:", "sshd", "9",
    )
    assert list(d) == ["_id", "sys", "time", "time_rcvd", "msg",
                       "syslog_fac", "syslog_sever", "syslog_tag",
                       "procid", "pid", "level"]
    # the reference's swapped naming: procid=PROGRAMNAME, pid=PROCID
    assert d["procid"] == "sshd" and d["pid"] == "9"
    assert d["level"] == "ERROR" and d["time"] == UTCDateTime(1000)


def test_template_doc_quirks():
    out = template_doc({
        "time": "2024-01-01T00:00:01Z",      # parses -> datetime
        "date": "not a date",                 # DROPPED (reference falls out)
        "note": "2024-01-01T00:00:01Z",       # not date/time -> string
        "arr": [1, {"time": "bogus"}],
    })
    assert out["time"] == UTCDateTime(1704067201000)
    assert "date" not in out
    assert out["note"] == "2024-01-01T00:00:01Z"
    # arrays become numeric-key documents (BSON_APPEND_DOCUMENT quirk)
    assert out["arr"] == {"0": 1, "1": {}}


class MiniMongod:
    """Decodes insert OP_MSGs (kind-0 body and kind-1 documents
    sections) and replies {ok: 1.0, n: <count>}."""

    def __init__(self):
        self.inserted = []
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]
        threading.Thread(target=self._run, daemon=True).start()

    def _run(self):
        while True:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._session, args=(conn,), daemon=True
            ).start()

    def _session(self, conn):
        buf = bytearray()
        with conn:
            while True:
                try:
                    got = read_op_msg(conn, buf)
                except (OSError, ValueError):
                    return
                if got is None:
                    return
                req, _, _, body = got
                docs = body.get("documents", [])
                self.inserted.extend(docs)
                conn.sendall(op_msg(
                    1000 + req, {"n": len(docs), "ok": 1.0},
                    response_to=req,
                ))

    def close(self):
        self.srv.close()


def test_insert_round_trip():
    srv = MiniMongod()
    try:
        ins = MongoInserter("127.0.0.1", srv.port, "logs", "syslog")
        n = ins.insert([
            default_doc(ObjectId(b"\x03" * 12), "h", 1, 2, "m",
                        0, 6, "t:", "t", "-"),
            {"plain": "doc"},
        ])
        ins.close()
        assert n == 2
        assert srv.inserted[0]["sys"] == "h"
        assert srv.inserted[0]["level"] == "INFO"
        assert srv.inserted[1] == {"plain": "doc"}
    finally:
        srv.close()


def test_ommongodb_deliver(spark):
    srv = MiniMongod()
    try:
        df = spark.createDataFrame(
            [(i, f"msg{i}", "h1", "app[1]:", "app", "1", 4, i % 8)
             for i in range(5)],
            "id long, msg string, hostname string, syslogtag string, "
            "programname string, procid string, facility long, "
            "severity long",
        ).repartition(1)
        out = ommongodb_deliver(
            df, "127.0.0.1", srv.port, batch_size=2,
            oid_fn=lambda i: bytes([i % 256] * 12),
        ).collect()
        assert sum(r.n_inserted for r in out) == 5
        msgs = sorted(d["msg"] for d in srv.inserted)
        assert msgs == [f"msg{i}" for i in range(5)]
        levels = {d["msg"]: d["level"] for d in srv.inserted}
        assert levels["msg0"] == "FATAL" and levels["msg4"] == "WARN"
    finally:
        srv.close()
