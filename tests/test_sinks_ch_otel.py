"""omclickhouse and omotel sinks (shared omhttp delivery engine)."""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from rsyslog_spark import flagship
from rsyslog_spark.sinks import (
    omclickhouse_post,
    omhttp_batch,
    omotel_post,
    omotel_record,
)


@pytest.fixture()
def http_sink():
    received: list[bytes] = []
    lock = threading.Lock()

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with lock:
                received.append(body)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv.server_address[1], received, lock
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# omclickhouse
# ---------------------------------------------------------------------------

def test_clickhouse_bulk_merge(spark, sf_dir):
    """computeBulkMessage (omclickhouse.c:411-431): first statement
    whole, later ones contribute from the '(' after VALUES, no
    separator."""
    p = flagship.build_parsed(spark, sf_dir).limit(5)
    bodies = omhttp_batch(
        p, template="RSYSLOG_StdClickHouseFmt",
        batch_format="clickhouse", batch_size=5, order_by="doc_id",
        n_buckets=1,
    ).collect()
    assert len(bodies) == 1
    body = bodies[0].body
    assert body.startswith("INSERT INTO rsyslog.SystemEvents")
    assert body.count("INSERT INTO") == 1
    # 5 value tuples: ...VALUES (..)(..)(..)(..)(..)
    assert body.count("(severity, facility") == 1
    values_part = body.split("VALUES", 1)[1]
    assert values_part.count(")(") == 4


def test_clickhouse_no_values_falls_back_whole(spark):
    df = spark.createDataFrame(
        [("a",), ("b",)], "msg string"
    ).withColumn("hostname", F.lit("h")) \
     .withColumn("syslogtag", F.lit("t")) \
     .withColumn("severity", F.lit(3)) \
     .withColumn("facility", F.lit(1)) \
     .withColumn("timereported_str", F.lit("-"))
    bodies = omhttp_batch(
        df, template=F.concat(F.lit("INSERT-ish "), F.col("msg")),
        batch_format="clickhouse", batch_size=2, order_by="msg",
        n_buckets=1,
    ).collect()
    assert bodies[0].body == "INSERT-ish aINSERT-ish b"


def test_clickhouse_post_real_server(spark, sf_dir, http_sink):
    port, received, lock = http_sink
    p = flagship.build_parsed(spark, sf_dir).limit(6)
    rep = omclickhouse_post(
        p, f"http://127.0.0.1:{port}/", batch_size=3, order_by="doc_id",
        n_buckets=1,
    ).collect()
    assert rep and all(r.ok and r.status == 200 for r in rep)
    with lock:
        got = [b.decode() for b in received]
    assert got and all(g.startswith("INSERT INTO") for g in got)
    assert sum(g.count("msgnum:") for g in got) == 6  # every row delivered

    # a non-INSERT rendering is dropped up front (omclickhouse.c:468)
    with lock:
        received.clear()
    rep2 = omclickhouse_post(
        p, f"http://127.0.0.1:{port}/",
        template=F.lit("SELECT 1"), batch_size=3,
    ).collect()
    assert rep2 == []
    with lock:
        assert received == []


# ---------------------------------------------------------------------------
# omotel
# ---------------------------------------------------------------------------

def test_omotel_record_shape(spark):
    df = spark.createDataFrame(
        [
            (3, 4, "h1", "app", "42", "m1", "boom",
             "2024-05-01 12:00:00"),
            (9, 0, None, "app2", None, None, "quiet",
             "2024-05-01 12:00:01"),
        ],
        "severity int, facility int, hostname string, "
        "programname string, procid string, msgid string, msg string, "
        "ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    rows = df.select(
        omotel_record(ts_col="ts").alias("rec")
    ).collect()
    r0 = json.loads(rows[0].rec)
    assert r0["severityNumber"] == 17 and r0["severityText"] == "ERROR"
    assert r0["body"] == {"stringValue": "boom"}
    assert r0["timeUnixNano"] == str(
        1714564800 * 1_000_000_000
    )
    attrs = {a["key"]: a["value"] for a in r0["attributes"]}
    assert attrs["log.syslog.hostname"] == {"stringValue": "h1"}
    assert attrs["log.syslog.facility"] == {"intValue": 4}
    assert attrs["log.syslog.procid"] == {"stringValue": "42"}

    # unmapped severity → 0, no text (omotel.c:1244); null props
    # omitted from attributes like the reference's NULL checks
    r1 = json.loads(rows[1].rec)
    assert r1["severityNumber"] == 0
    assert "severityText" not in r1
    keys = {a["key"] for a in r1["attributes"]}
    assert "log.syslog.hostname" not in keys
    assert "log.syslog.procid" not in keys
    assert "log.syslog.appname" in keys


def test_omotel_post_envelope(spark, sf_dir, http_sink):
    port, received, lock = http_sink
    p = flagship.build_parsed(spark, sf_dir).limit(8).withColumn(
        "ts", F.to_timestamp(F.lit("2024-05-01 00:00:00"))
    )
    rep = omotel_post(
        p, f"http://127.0.0.1:{port}/v1/logs", batch_size=4,
        order_by="doc_id", n_buckets=1,
        resource_attrs={"service.name": "edge"},
    ).collect()
    assert rep and all(r.ok for r in rep)
    with lock:
        payloads = [json.loads(b) for b in received]
    assert len(payloads) == 2
    total = 0
    for pl in payloads:
        rl = pl["resourceLogs"]
        assert len(rl) == 1
        res_attrs = {
            a["key"]: a["value"]["stringValue"]
            for a in rl[0]["resource"]["attributes"]
        }
        assert res_attrs == {"service.name": "edge"}
        scope = rl[0]["scopeLogs"][0]["scope"]
        assert scope["name"] == "rsyslog.omotel"
        recs = rl[0]["scopeLogs"][0]["logRecords"]
        total += len(recs)
        for rec in recs:
            assert "severityNumber" in rec
            assert rec["body"]["stringValue"]
    assert total == 8
