"""omawslogshlc (CloudWatch HLC) and omazuredce (Azure Monitor Logs
Ingestion) — envelope shapes, auth headers, OAuth token exchange —
against real local HTTP servers."""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from rsyslog_spark.sinks import (
    azure_oauth_token,
    omawslogshlc_post,
    omazuredce_post,
)


@pytest.fixture()
def capture_server():
    """Records (path, headers, body) per POST; optional token mode."""
    seen: list[tuple[str, dict, bytes]] = []
    lock = threading.Lock()

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with lock:
                seen.append((self.path, dict(self.headers), body))
            if self.path.startswith("/oauth"):
                reply = json.dumps(
                    {"access_token": "tok-123", "expires_in": 3599}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(reply)))
                self.end_headers()
                self.wfile.write(reply)
                return
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv.server_address[1], seen, lock
    finally:
        srv.shutdown()


def _rows(spark):
    return spark.createDataFrame(
        [(1, "boot ok", "h1", "2024-01-01 00:00:01"),
         (2, "", "h2", "2024-01-01 00:00:02"),          # -> "(empty)"
         (3, 'quote " and \n newline', "h3", "2024-01-01 00:00:03")],
        "id long, msg string, hostname string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_awslogshlc_envelope_and_auth(spark, capture_server):
    port, seen, lock = capture_server
    report = omawslogshlc_post(
        _rows(spark),
        bearer_token="sekrit",
        log_group="my group",          # needs URL-encoding
        log_stream="app/stream",
        url=f"http://127.0.0.1:{port}/services/collector/event",
        ts_col="ts",
        batch_size=10,
        order_by="id",
        n_buckets=1,
    ).collect()
    assert all(r.ok for r in report)
    with lock:
        assert len(seen) == 1
        path, headers, body = seen[0]
    assert path == (
        "/services/collector/event?logGroup=my%20group"
        "&logStream=app%2Fstream"
    )
    assert headers["Authorization"] == "Bearer sekrit"
    assert headers["Content-Type"] == "application/json"
    # concatenated JSON objects, no separator (appendEvent semantics)
    text = body.decode()
    assert "}{" in text and "\n{" not in text
    # decode the concatenated objects sequentially
    dec, off, objs = json.JSONDecoder(), 0, []
    while off < len(text):
        obj, off = dec.raw_decode(text, off)
        objs.append(obj)
    assert [o["event"] for o in objs] == [
        "boot ok", "(empty)", 'quote " and \n newline'
    ]
    assert all(o["source"] == "rsyslog" for o in objs)
    assert [o["host"] for o in objs] == ["h1", "h2", "h3"]
    assert objs[0]["time"] == 1704067201.0  # event time, not send time


def test_awslogshlc_needs_region_or_url(spark):
    with pytest.raises(ValueError, match="region= or url="):
        omawslogshlc_post(_rows(spark), "t", "g", "s")


def test_azure_token_and_dce_post(spark, capture_server):
    port, seen, lock = capture_server
    token = azure_oauth_token(
        f"http://127.0.0.1:{port}/oauth/tenant-1/token",
        client_id="cid", client_secret="cs",
    )
    assert token == "tok-123"
    with lock:
        path, headers, body = seen[0]
    form = dict(
        kv.split("=", 1) for kv in body.decode().split("&")
    )
    assert form["client_id"] == "cid"
    assert form["grant_type"] == "client_credentials"
    assert form["scope"] == "https%3A%2F%2Fmonitor.azure.com%2F.default"

    report = omazuredce_post(
        _rows(spark).select(
            F.col("id"), F.col("msg"), F.col("hostname"),
        ),
        dce_url=f"http://127.0.0.1:{port}/dce",
        dcr_id="dcr-abc",
        stream_name="Custom-Syslog",
        bearer_token=token,
        template=F.to_json(F.struct("id", "msg", "hostname")),
        order_by="id",
        n_buckets=1,
    ).collect()
    assert all(r.ok for r in report)
    with lock:
        path, headers, body = seen[-1]
    assert path == (
        "/dce/dataCollectionRules/dcr-abc/streams/Custom-Syslog"
        "?api-version=2023-01-01"
    )
    assert headers["Authorization"] == "Bearer tok-123"
    arr = json.loads(body)
    assert isinstance(arr, list) and len(arr) == 3
    assert arr[0]["msg"] == "boot ok"
