"""RESP codec + omhiredis/imhiredis against a loopback RESP peer."""

from __future__ import annotations

import socket
import socketserver
import threading

import pytest

from rsyslog_spark import redis_wire as rw


# ---------------------------------------------------------------------------
# minimal in-memory Redis speaking RESP2 (loopback test peer)
# ---------------------------------------------------------------------------

class MiniRedis:
    def __init__(self):
        self.lists: dict[str, list[bytes]] = {}
        self.kv: dict[str, bytes] = {}
        self.streams: dict[str, list[tuple[str, list[bytes]]]] = {}
        self.published: list[tuple[str, bytes]] = []
        self.seq = 0
        self.lock = threading.Lock()

    def execute(self, argv: list[bytes]) -> bytes:
        cmd = argv[0].decode().upper()
        with self.lock:
            if cmd in ("LPUSH", "RPUSH"):
                lst = self.lists.setdefault(argv[1].decode(), [])
                if cmd == "LPUSH":
                    lst.insert(0, argv[2])
                else:
                    lst.append(argv[2])
                return b":%d\r\n" % len(lst)
            if cmd in ("LPOP", "RPOP"):
                lst = self.lists.get(argv[1].decode(), [])
                if not lst:
                    return b"$-1\r\n"
                v = lst.pop(0) if cmd == "LPOP" else lst.pop()
                return b"$%d\r\n%s\r\n" % (len(v), v)
            if cmd == "PUBLISH":
                self.published.append((argv[1].decode(), argv[2]))
                return b":0\r\n"
            if cmd in ("SET", "SETEX"):
                val = argv[3] if cmd == "SETEX" else argv[2]
                self.kv[argv[1].decode()] = val
                return b"+OK\r\n"
            if cmd == "XADD":
                i = 2
                if argv[2].upper() == b"MAXLEN":
                    i = 5  # MAXLEN ~ n
                assert argv[i] == b"*"
                fields = argv[i + 1:]
                self.seq += 1
                xid = f"1-{self.seq}"
                self.streams.setdefault(argv[1].decode(), []).append(
                    (xid, fields)
                )
                b = xid.encode()
                return b"$%d\r\n%s\r\n" % (len(b), b)
            return b"-ERR unknown command\r\n"


def _serve(mini: MiniRedis):
    class H(socketserver.BaseRequestHandler):
        def handle(self):
            buf = bytearray()
            while True:
                try:
                    argv, pos = rw.resp_parse(bytes(buf))
                except (IndexError, ValueError):
                    chunk = self.request.recv(65536)
                    if not chunk:
                        return
                    buf.extend(chunk)
                    continue
                del buf[:pos]
                self.request.sendall(mini.execute(argv))

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), H)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


@pytest.fixture()
def mini_redis():
    mini = MiniRedis()
    srv = _serve(mini)
    try:
        yield mini, srv.server_address[1]
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def test_resp_roundtrip():
    enc = rw.resp_encode_command("LPUSH", "k", "hello world")
    assert enc == b"*3\r\n$5\r\nLPUSH\r\n$1\r\nk\r\n$11\r\nhello world\r\n"
    argv, pos = rw.resp_parse(enc)
    assert argv == [b"LPUSH", b"k", b"hello world"] and pos == len(enc)

    assert rw.resp_parse(b"+OK\r\n")[0] == "OK"
    assert rw.resp_parse(b":42\r\n")[0] == 42
    assert rw.resp_parse(b"$-1\r\n")[0] is None
    assert rw.resp_parse(b"*-1\r\n")[0] is None
    err, _ = rw.resp_parse(b"-ERR boom\r\n")
    assert isinstance(err, rw.RespError) and "boom" in str(err)
    # nested array
    v, _ = rw.resp_parse(b"*2\r\n:1\r\n*1\r\n$1\r\na\r\n")
    assert v == [1, [b"a"]]
    with pytest.raises(IndexError):
        rw.resp_parse(b"$5\r\nab")  # incomplete


def test_omhiredis_command_modes():
    assert rw.omhiredis_command("m", mode="queue", key="q") == [
        "LPUSH", "q", "m"
    ]
    assert rw.omhiredis_command(
        "m", mode="queue", key="q", use_rpush=True
    ) == ["RPUSH", "q", "m"]
    assert rw.omhiredis_command("m", mode="publish", key="c") == [
        "PUBLISH", "c", "m"
    ]
    assert rw.omhiredis_command("m", mode="set", key="k") == [
        "SET", "k", "m"
    ]
    assert rw.omhiredis_command(
        "m", mode="set", key="k", expiration=60
    ) == ["SETEX", "k", "60", "m"]
    assert rw.omhiredis_command("m", mode="stream", key="s") == [
        "XADD", "s", "*", "msg", "m"
    ]
    assert rw.omhiredis_command(
        "m", mode="stream", key="s", stream_capacity=1000
    ) == ["XADD", "s", "MAXLEN", "~", "1000", "*", "msg", "m"]
    assert rw.omhiredis_command("GET x", mode="template") == ["GET", "x"]
    with pytest.raises(ValueError):
        rw.omhiredis_command("m", mode="nope")


# ---------------------------------------------------------------------------
# loopback round-trips
# ---------------------------------------------------------------------------

def test_deliver_and_dequeue_roundtrip(spark, mini_redis):
    mini, port = mini_redis
    msgs = [f"msg-{i:03d}" for i in range(37)]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")

    rep = rw.omhiredis_deliver(
        df.repartition(2), "127.0.0.1", port,
        mode="queue", key="q1", use_rpush=True, pipeline_size=8,
    ).collect()
    assert sum(r.n_sent for r in rep) == 37
    assert sum(r.n_errors for r in rep) == 0
    assert len(mini.lists["q1"]) == 37

    out = rw.imhiredis_dequeue(
        spark, "127.0.0.1", port, key="q1", use_lpop=True, batchsize=5
    )
    got = [r.value for r in out.collect()]
    # RPUSH appends, LPOP pops from the head → FIFO order per
    # partition; both partitions interleave but the set is exact
    assert sorted(got) == msgs
    assert mini.lists["q1"] == []

    # second dequeue: queue drained → empty frame
    assert rw.imhiredis_dequeue(
        spark, "127.0.0.1", port, key="q1"
    ).count() == 0


def test_deliver_stream_and_set(spark, mini_redis):
    mini, port = mini_redis
    df = spark.createDataFrame([("a",), ("b",)], "value string")
    rep = rw.omhiredis_deliver(
        df.coalesce(1), "127.0.0.1", port, mode="stream", key="s1",
    ).collect()
    assert rep[0].n_sent == 2 and rep[0].n_errors == 0
    assert [f for _, f in mini.streams["s1"]] == [
        [b"msg", b"a"], [b"msg", b"b"]
    ] or sorted(
        f[1] for _, f in mini.streams["s1"]
    ) == [b"a", b"b"]

    rw.omhiredis_deliver(
        df.coalesce(1), "127.0.0.1", port, mode="set", key="last",
    ).collect()
    assert mini.kv["last"] in (b"a", b"b")

    # error replies are counted, not raised (action suspension is the
    # caller's policy)
    bad = rw.omhiredis_deliver(
        df.coalesce(1), "127.0.0.1", port, mode="template",
    ).collect()
    assert bad[0].n_errors == 2 and bad[0].n_sent == 0


def test_dequeue_max_messages(spark, mini_redis):
    mini, port = mini_redis
    with socket.create_connection(("127.0.0.1", port)) as s:
        buf = bytearray()
        for i in range(12):
            s.sendall(rw.resp_encode_command("RPUSH", "q2", f"m{i}"))
            rw._read_reply(s, buf)
    out = rw.imhiredis_dequeue(
        spark, "127.0.0.1", port, key="q2", use_lpop=True,
        batchsize=5, max_messages=7,
    )
    assert [r.value for r in out.collect()] == [f"m{i}" for i in range(7)]
    assert len(mini.lists["q2"]) == 5
