"""omhttpfs REST sink + omudpspoof frame construction."""

from __future__ import annotations

import http.server
import threading

from pyspark.sql import functions as F

from rsyslog_spark import pcap
from rsyslog_spark.sinks import omhttpfs_deliver, omudpspoof_frame


def test_omhttpfs_append_create_flow(spark):
    """APPEND first; 404 → CREATE (omhttpfs.c:444-546)."""
    files: dict[str, bytes] = {}
    calls: list[tuple[str, str]] = []
    lock = threading.Lock()

    class H(http.server.BaseHTTPRequestHandler):
        def _handle(self, method):
            body = self.rfile.read(
                int(self.headers.get("Content-Length", 0))
            )
            path, _, query = self.path.partition("?")
            with lock:
                calls.append((method, self.path))
                if "op=append" in query:
                    if path not in files:
                        code = 404
                    else:
                        files[path] += body
                        code = 200
                elif "op=create" in query:
                    if path in files and "overwrite=false" in query:
                        code = 403
                    else:
                        files[path] = body
                        code = 201
                else:
                    code = 400
            self.send_response(code)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_POST(self):
            self._handle("POST")

        def do_PUT(self):
            self._handle("PUT")

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [(f"line{i}",) for i in range(6)], "value string"
        )
        rep = omhttpfs_deliver(
            df.coalesce(1), f"http://127.0.0.1:{port}",
            "/logs/app.log", user="u1",
        ).collect()
        assert rep[0].n_messages == 6 and rep[0].created
        with lock:
            content = files["/webhdfs/v1/logs/app.log"].decode()
        assert content == "".join(f"line{i}\n" for i in range(6))
        # second delivery appends without create
        omhttpfs_deliver(
            df.coalesce(1), f"http://127.0.0.1:{port}",
            "/logs/app.log",
        ).collect()
        with lock:
            assert files["/webhdfs/v1/logs/app.log"].decode().count(
                "line0"
            ) == 2
            assert ("POST", calls[0][1]) == calls[0]
            assert "user.name=u1" in calls[0][1]
    finally:
        srv.shutdown()


def test_omudpspoof_frame_roundtrip(spark):
    """The spoofed frame parses back with the ORIGINAL sender as the
    UDP source (the whole point of omudpspoof)."""
    df = spark.createDataFrame(
        [("<13>m one", "10.1.2.3"), ("<14>m two", "192.168.9.8")],
        "value string, fromhost_ip string",
    )
    framed = omudpspoof_frame(df, dst_ip="172.16.0.1", dst_port=514)
    out = pcap.packet_parse(framed).orderBy("value").collect()
    assert out[0].src_ip == "10.1.2.3"
    assert out[1].src_ip == "192.168.9.8"
    assert all(r.dst_ip == "172.16.0.1" for r in out)
    assert all(r.dst_port == 514 and r.src_port == 514 for r in out)
    assert [r.payload for r in out] == ["<13>m one", "<14>m two"]
    assert all(r.ip_proto == 17 for r in out)
