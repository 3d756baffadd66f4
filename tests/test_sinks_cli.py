"""Sink writers (omfile dynafiles, kafka frames, failover) + CLI."""

from __future__ import annotations

import pyspark.sql.functions as F

from rsyslog_spark import flagship, sinks


def test_omfile_dynafile_partitioning(spark, sf_dir, tmp_path):
    parsed = flagship.build_parsed(spark, sf_dir)
    out = str(tmp_path / "dyna")
    # dynafile template by programname ≙ partitionBy
    sinks.omfile(parsed, out, dynafile_parts={"prog": "%programname%"})
    got = spark.read.parquet(out)
    assert got.count() == 1000
    import os

    parts = {p for p in os.listdir(out) if p.startswith("prog=")}
    assert {"prog=error", "prog=signup", "prog=purchase", "prog=click",
            "prog=view"} == parts


def test_omfile_text_template(spark, sf_dir, tmp_path):
    parsed = flagship.build_parsed(spark, sf_dir).limit(10)
    out = str(tmp_path / "txt")
    sinks.omfile(parsed, out, template="RSYSLOG_TraditionalFileFormat")
    lines = [r.value for r in spark.read.text(out).collect()]
    assert len(lines) == 10
    assert all(" host" in ln for ln in lines)


def test_omkafka_frame(spark, sf_dir):
    parsed = flagship.build_parsed(spark, sf_dir).limit(5)
    frame = sinks.omkafka_frame(
        parsed,
        template="%msg%",
        dynakey="%hostname%",
        dynatopic="logs-%programname%",
    )
    assert frame.columns == ["key", "value", "topic"]
    r = frame.first()
    assert r.topic.startswith("logs-") and r.key.startswith("host")


def test_failover_chain(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "x int")
    a = F.col("x") == 1
    b = F.col("x") <= 2
    c = F.lit(True)
    chain = sinks.failover_chain(df, a, b, c)
    got = df.select(
        *[p.alias(f"p{i}") for i, p in enumerate(chain)]
    ).orderBy("p0").collect()
    fired = [sum(1 for i in range(3) if row[f"p{i}"]) for row in got]
    assert fired == [1, 1, 1]  # exactly one action fires per row


def test_cli_main(spark, sf_dir, tmp_path):
    from rsyslog_spark import cli

    rc = cli.main(
        [
            "--sf-dir", sf_dir,
            "--out", str(tmp_path / "cli_sinks"),
            "--master", "local[4]",
        ]
    )
    assert rc == 0
    got = spark.read.parquet(str(tmp_path / "cli_sinks" / "rest"))
    assert got.count() > 0


def test_omelasticsearch_bulk_frame(spark):
    """omelasticsearch bulkmode entry shape (omelasticsearch.c:88-94)."""
    import json

    from rsyslog_spark.sinks import omelasticsearch_frame

    df = spark.createDataFrame(
        [("host1", 'msg "quoted"', "d1")],
        "hostname string, msg string, doc_id string",
    )
    out = omelasticsearch_frame(
        df,
        template='{"host":"%hostname:::json%","message":"%msg:::json%"}',
        index="logs-%hostname%",
        dyn_index=True,
        id_template="%doc_id%",
    ).first().value
    action, doc = out.split("\n")
    a = json.loads(action)
    assert a["index"]["_index"] == "logs-host1"
    assert a["index"]["_id"] == "d1"
    d = json.loads(doc)
    assert d == {"host": "host1", "message": 'msg "quoted"'}
    # create mode
    out2 = omelasticsearch_frame(
        df, template='{"m":"%msg:::json%"}', index="fixed",
        write_operation="create",
    ).first().value
    assert json.loads(out2.split("\n")[0])["create"]["_index"] == "fixed"


def test_omfile_compression(spark, tmp_path):
    import os

    from rsyslog_spark.sinks import omfile

    df = spark.createDataFrame([("a line",)], "msg string")
    path = str(tmp_path / "gz")
    omfile(df, path, template="%msg%\n", compression="gzip", fmt="text")
    files = [f for f in os.listdir(path) if f.endswith(".gz")]
    assert files, os.listdir(path)


def test_omfwd_framing(spark):
    """RFC 6587 framing (omfwd.c:2277-2279): octet-counted byte-length
    prefix vs traditional LF termination."""
    from rsyslog_spark.sinks import omfwd_frame

    df = spark.createDataFrame(
        [("host1", "app:", " hi", 13, 1, 5, "Jun 15 10:54:39")],
        "hostname string, syslogtag string, msg string, pri int, "
        "facility int, severity int, timereported_str string",
    )
    lf = omfwd_frame(df, "<%pri%>%msg%", framing="octet-stuffing").first().value
    assert lf == "<13> hi\n"
    oc = omfwd_frame(df, "<%pri%>%msg%", framing="octet-counted").first().value
    assert oc == "7 <13> hi"  # '<13> hi' is 7 bytes


def test_omprog_confirm_messages(spark, tmp_path):
    """omprog: rendered lines piped to a real external program; with
    confirmMessages the child acks per line ('OK' or failure reason)."""
    import sys

    from rsyslog_spark.sinks import omprog

    child = [
        sys.executable, "-u", "-c",
        ("import sys\n"
         "for line in sys.stdin:\n"
         "    print('OK' if 'bad' not in line else 'cannot deliver')\n"),
    ]
    df = spark.createDataFrame(
        [("host1", "app:", " fine", 13, 1, 5, "Jun 15 10:54:39"),
         ("host1", "app:", " bad news", 13, 1, 5, "Jun 15 10:54:39")],
        "hostname string, syslogtag string, msg string, pri int, "
        "facility int, severity int, timereported_str string",
    )
    rows = omprog(df, child, template="%syslogtag%%msg%",
                  confirm_messages=True).collect()
    by_val = {r.value: r for r in rows}
    assert by_val["app: fine"].delivered and by_val["app: fine"].reply == "OK"
    assert not by_val["app: bad news"].delivered
    assert by_val["app: bad news"].reply == "cannot deliver"
    # fire-and-forget mode: everything reported delivered
    rows2 = omprog(df, child, template="%msg%").collect()
    assert all(r.delivered for r in rows2)


def test_omhttp_batch_formats(spark, sf_dir):
    """omhttp batch serialization (omhttp.c VALID_BATCH_FORMATS):
    newline/jsonarray/kafkarest/lokirest bodies, batch_size grouping."""
    import json

    from rsyslog_spark import flagship
    from rsyslog_spark.sinks import omhttp_batch

    p = flagship.build_parsed(spark, sf_dir).limit(25)
    nl = omhttp_batch(p, batch_format="newline", batch_size=10)
    rows = nl.collect()
    assert sum(r.n_messages for r in rows) == 25
    assert all(r.body.count("\n") == r.n_messages - 1 for r in rows)

    ja = omhttp_batch(p, batch_format="jsonarray", batch_size=10).first()
    arr = json.loads(ja.body)
    assert isinstance(arr, list) and len(arr) == ja.n_messages
    assert "message" in arr[0]  # StdJSON docs

    kr = omhttp_batch(p, batch_format="kafkarest", batch_size=10).first()
    recs = json.loads(kr.body)["records"]
    assert len(recs) == kr.n_messages and "value" in recs[0]

    import pyspark.sql.functions as F2

    p2 = p.withColumn("ts", F2.to_timestamp(F2.lit("2024-01-01 00:00:00")))
    lk = omhttp_batch(
        p2, batch_format="lokirest", batch_size=10, ts_col="ts",
        loki_labels={"job": "syslog", "env": "test"},
    ).first()
    body = json.loads(lk.body)
    stream = body["streams"][0]
    assert stream["stream"] == {"job": "syslog", "env": "test"}
    assert len(stream["values"]) == lk.n_messages
    ns, line = stream["values"][0]
    assert ns.endswith("000000000") and line.startswith("{")

    # ADVICE r4: values within each body are ns-sorted even when
    # order_by is NOT the timestamp column (Loki rejects out-of-order)
    p3 = p.withColumn(
        "ts",
        F2.to_timestamp(
            F2.concat(
                F2.lit("2024-01-01 00:00:"),
                F2.lpad(
                    F2.pmod(F2.xxhash64("rawmsg"), F2.lit(60)).cast("string"),
                    2, "0",
                ),
            )
        ),
    )
    for r in omhttp_batch(
        p3, batch_format="lokirest", batch_size=10, ts_col="ts",
        order_by="doc_id",
    ).collect():
        vals = [int(v[0]) for v in json.loads(r.body)["streams"][0]["values"]]
        assert vals == sorted(vals) and len(vals) == r.n_messages

    import pytest

    with pytest.raises(ValueError, match="invalid"):
        omhttp_batch(p, batch_format="bogus")
    with pytest.raises(ValueError, match="ts_col"):
        omhttp_batch(p, batch_format="lokirest")


def test_omhttp_post_real_server(spark, sf_dir):
    """omhttp delivery against a REAL localhost HTTP server: every
    batch body arrives byte-identical, transient 503s are retried
    (httpretrycodes semantics), and a hard 404 reports ok=false after
    one attempt (the retry.ruleset feed)."""
    import http.server
    import threading

    from rsyslog_spark import flagship
    from rsyslog_spark.sinks import omhttp_batch, omhttp_post

    received: list[bytes] = []
    flaky_seen: set[bytes] = set()
    lock = threading.Lock()

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with lock:
                if self.path == "/missing":
                    code = 404
                elif self.path == "/flaky" and body not in flaky_seen:
                    flaky_seen.add(body)
                    code = 503
                else:
                    received.append(body)
                    code = 200
            self.send_response(code)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        p = flagship.build_parsed(spark, sf_dir).limit(20)
        rep = omhttp_post(
            p, f"http://127.0.0.1:{port}/", batch_size=7,
            order_by="doc_id",
        )
        rows = rep.collect()
        assert rows and all(r.ok and r.status == 200 for r in rows)
        expected = {
            r.body.encode("utf-8")
            for r in omhttp_batch(
                p, batch_size=7, order_by="doc_id"
            ).collect()
        }
        with lock:
            got = set(received)
        assert got == expected  # byte-identical delivery

        # transient 503 → one retry, then delivered
        rows2 = omhttp_post(
            p, f"http://127.0.0.1:{port}/flaky", batch_size=7,
            order_by="doc_id",
        ).collect()
        assert all(r.ok and r.attempts == 2 for r in rows2)

        # hard 404: not in the retry set → single attempt, ok=false
        rows3 = omhttp_post(
            p, f"http://127.0.0.1:{port}/missing", batch_size=7,
            order_by="doc_id",
        ).collect()
        assert all((not r.ok) and r.status == 404 and r.attempts == 1
                   for r in rows3)

        # omelasticsearch _bulk over the same delivery engine: one
        # NDJSON body of action+doc lines, delivered byte-identical
        import json

        import pyspark.sql.functions as F2

        from rsyslog_spark.sinks import (
            http_post_bodies, omelasticsearch_frame,
        )

        with lock:
            received.clear()
        bulk = omelasticsearch_frame(
            p.limit(5), "RSYSLOG_StdJSONFmt", index="logs"
        ).agg(
            F2.concat(
                F2.concat_ws("\n", F2.collect_list("value")), F2.lit("\n")
            ).alias("body")
        )
        rep2 = http_post_bodies(
            bulk, f"http://127.0.0.1:{port}/_bulk",
            headers={"Content-Type": "application/x-ndjson"},
        ).collect()
        assert len(rep2) == 1 and rep2[0].ok
        with lock:
            nd = received[-1].decode().rstrip("\n").split("\n")
        assert len(nd) == 10  # 5 action lines + 5 docs
        assert json.loads(nd[0]) == {"index": {"_index": "logs"}}
        assert "message" in json.loads(nd[1])
    finally:
        srv.shutdown()


def test_http_request_function(spark):
    """fmhttp http_request(url) against a real localhost server: body
    returned per url, per-batch memo dedups repeated urls, errors →
    null (reference's dummy-0 divergence documented)."""
    import http.server
    import threading

    from rsyslog_spark import functions as fn

    hits: list[str] = []
    lock = threading.Lock()

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            with lock:
                hits.append(self.path)
            body = f"body-of{self.path}".encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    # reserve a genuinely-dead port (bind-and-close) rather than
    # assuming port+1 is unbound
    import socket

    _s = socket.socket()
    _s.bind(("127.0.0.1", 0))
    dead_port = _s.getsockname()[1]
    _s.close()
    try:
        df = spark.createDataFrame(
            [(f"http://127.0.0.1:{port}/a",),
             (f"http://127.0.0.1:{port}/a",),   # duplicate → memo hit
             (f"http://127.0.0.1:{port}/b",),
             (f"http://127.0.0.1:{dead_port}/dead",),  # refused → null
             ("file:///etc/hostname",),          # scheme blocked → null
             (None,)],
            "url string",
        ).coalesce(1)
        rows = df.select(
            "url", fn.http_request(F.col("url"), timeout_secs=3).alias("r")
        ).collect()
        got = {r.url: r.r for r in rows}
        assert got[f"http://127.0.0.1:{port}/a"] == "body-of/a"
        assert got[f"http://127.0.0.1:{port}/b"] == "body-of/b"
        assert got[f"http://127.0.0.1:{dead_port}/dead"] is None
        assert got["file:///etc/hostname"] is None  # allowlist
        assert got[None] is None
        with lock:
            assert hits.count("/a") == 1  # memo: one GET for two rows

        # ADVICE r4 host policy: deny blocks even a live server; an
        # allow list that doesn't cover the host blocks it; an allow
        # list that does keeps it fetchable (no network for blocked
        # rows — hit count unchanged)
        live = spark.createDataFrame(
            [(f"http://127.0.0.1:{port}/c",)], "url string"
        ).coalesce(1)
        assert live.select(
            fn.http_request(F.col("url"), timeout_secs=3,
                            deny_hosts=["127.0.0.1"]).alias("r")
        ).first().r is None
        assert live.select(
            fn.http_request(F.col("url"), timeout_secs=3,
                            allow_hosts=["example.com"]).alias("r")
        ).first().r is None
        with lock:
            assert hits.count("/c") == 0
        assert live.select(
            fn.http_request(F.col("url"), timeout_secs=3,
                            allow_hosts=["127.0.0.1"]).alias("r")
        ).first().r == "body-of/c"
    finally:
        srv.shutdown()


def test_omhttp_batch_stable_identity(spark, sf_dir):
    """r4 (VERDICT r3 next #6): with order_by, row→batch assignment is
    a pure function of the stable key — the same input produces
    byte-identical request bodies regardless of input partitioning
    (which is what a task retry changes)."""
    from rsyslog_spark import flagship
    from rsyslog_spark.sinks import omhttp_batch

    p = flagship.build_parsed(spark, sf_dir).limit(40)

    def bodies(src):
        return sorted(
            (r.partition, r.batch_seq, r.body)
            for r in omhttp_batch(
                src, batch_format="newline", batch_size=7,
                order_by="doc_id", n_buckets=4,
            ).collect()
        )

    b1 = bodies(p.repartition(5))
    b2 = bodies(p.repartition(3, "source"))
    assert b1 == b2 and len(b1) >= 4
    # and the default mode is NOT required to be stable — only the
    # order_by mode carries the guarantee (documented)

    # NON-unique order key (code-review r4 #1): ties break on the
    # rendered line, so bodies stay byte-identical anyway
    def bodies_by_source(src):
        return sorted(
            (r.partition, r.batch_seq, r.body)
            for r in omhttp_batch(
                src, batch_format="newline", batch_size=7,
                order_by="source", n_buckets=3,
            ).collect()
        )

    assert bodies_by_source(p.repartition(6)) == bodies_by_source(
        p.repartition(2, "doc_id")
    )


# ---------------- mmdarwin: live Darwin filter protocol ----------------

def _darwin_server(sockpath, frames, scores_fn):
    """A real Darwin filter endpoint (contrib/mmdarwin/protocol.h):
    accepts connections, reads 56-byte headers + body, records the
    exact frames, replies with certitude packets."""
    import socket as socketlib
    import threading

    from rsyslog_spark.darwin import (
        PACKET_SIZE, pack_packet, unpack_packet,
    )

    srv = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
    srv.bind(sockpath)
    srv.listen(8)
    stop = threading.Event()

    def recv_exact(c, n):
        buf = b""
        while len(buf) < n:
            b = c.recv(n - len(buf))
            if not b:
                return None
            buf += b
        return buf

    def serve():
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            with conn:
                while True:
                    hdr = recv_exact(conn, PACKET_SIZE)
                    if hdr is None:
                        break
                    h = unpack_packet(hdr)
                    body = recv_exact(conn, h["body_size"])
                    frames.append((h, body))
                    if h["response"] in (1, 3):  # back / both
                        conn.sendall(pack_packet(
                            response=1, filter_code=h["filter_code"],
                            body_size=0, evt_id=h["evt_id"],
                            certitude=scores_fn(body),
                            certitude_size=1,
                        ))

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    def shutdown():
        stop.set()
        srv.close()

    return shutdown


def test_mmdarwin_protocol_roundtrip(spark, tmp_path):
    """mmdarwin against a REAL unix-socket Darwin filter: exact
    56-byte header layout, [["v1","v2"]]\\0 body framing, certitude
    enrichment, send_partial skip semantics, fire-and-forget modes
    (mmdarwin.c doAction:740-825)."""
    from rsyslog_spark.darwin import mmdarwin

    sockpath = str(tmp_path / "darwin.sock")
    frames = []
    stop = _darwin_server(
        sockpath, frames, lambda body: len(body) % 100
    )
    try:
        df = spark.createDataFrame(
            [("10.0.0.1", "malware.example", 443),
             ("10.0.0.2", None, 80),
             ("10.0.0.3", "ok.example", 8080)],
            "src string, domain string, port int",
        ).coalesce(1)
        out = mmdarwin(
            df, sockpath, fields=["src", "domain", "port"],
            filtercode="0x62616C66", response="back",
        ).collect()
        rows = {r.src: r for r in out}
        # scored rows got the server's certitude; the partial row was
        # skipped entirely (send_partial default off)
        exp1 = len(b'[["10.0.0.1","malware.example","443"]]\0') % 100
        assert rows["10.0.0.1"].certitude == exp1
        assert rows["10.0.0.2"].certitude is None
        assert rows["10.0.0.2"].darwin_uuid is None
        assert rows["10.0.0.3"].certitude is not None
        # deterministic UUIDs: well-formed and distinct
        import uuid as uuidlib

        u1 = uuidlib.UUID(rows["10.0.0.1"].darwin_uuid)
        u3 = uuidlib.UUID(rows["10.0.0.3"].darwin_uuid)
        assert u1 != u3
        # server saw exactly 2 frames with the right header fields
        assert len(frames) == 2
        h, body = frames[0]
        assert h["filter_code"] == 0x62616C66
        assert h["response"] == 1 and h["type"] == 0
        assert body == b'[["10.0.0.1","malware.example","443"]]\0'
        assert h["body_size"] == len(body)
        assert h["evt_id"] == u1.bytes

        # send_partial=True sends the non-null prefix
        frames.clear()
        out2 = mmdarwin(
            df, sockpath, fields=["src", "domain", "port"],
            send_partial=True, response="back",
        ).collect()
        assert all(r.certitude is not None for r in out2)
        bodies = {b for _, b in frames}
        assert b'[["10.0.0.2","80"]]\0' in bodies

        # fire-and-forget: response='darwin' sends but never reads
        frames.clear()
        out3 = mmdarwin(
            df, sockpath, fields=["src"], response="darwin",
        ).collect()
        assert all(r.certitude is None for r in out3)
        assert all(r.darwin_uuid is not None for r in out3)
        import time

        for _ in range(50):
            if len(frames) == 3:
                break
            time.sleep(0.1)
        assert len(frames) == 3 and all(
            h["response"] == 2 for h, _ in frames
        )
    finally:
        stop()


def test_mmdarwin_socket_rotation(spark, tmp_path):
    """socket_max_use rotates the connection after N packets
    (mmdarwin.c:767-775) — the server sees multiple connections."""
    import socket as socketlib
    import threading

    from rsyslog_spark.darwin import (
        PACKET_SIZE, mmdarwin, pack_packet, unpack_packet,
    )

    sockpath = str(tmp_path / "d2.sock")
    conns = []
    srv = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
    srv.bind(sockpath)
    srv.listen(8)

    def recv_exact(c, n):
        buf = b""
        while len(buf) < n:
            b = c.recv(n - len(buf))
            if not b:
                return None
            buf += b
        return buf

    def serve():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            conns.append(conn)

            def handle(c):
                while True:
                    hdr = recv_exact(c, PACKET_SIZE)
                    if hdr is None:
                        return
                    h = unpack_packet(hdr)
                    recv_exact(c, h["body_size"])
                    c.sendall(pack_packet(1, 0, 0, h["evt_id"], 7, 1))

            threading.Thread(target=handle, args=(conn,),
                             daemon=True).start()

    threading.Thread(target=serve, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [(f"m{i}",) for i in range(6)], "msg string"
        ).coalesce(1)
        out = mmdarwin(
            df, sockpath, fields=["msg"], socket_max_use=2,
        ).collect()
        assert all(r.certitude == 7 for r in out)
        assert len(conns) == 3  # 6 packets / 2 per connection
    finally:
        srv.close()


# ---------------- omsql: transactional SQL sink ----------------

def test_omsql_statements_template_and_rollback(spark, tmp_path):
    """ommysql model: template-rendered INSERT statements, one
    transaction per batch, full rollback on any failure
    (ommysql.c commitTransaction:336-370)."""
    import sqlite3

    import pytest

    from rsyslog_spark.sinks import omsql_statements
    from rsyslog_spark.templates import compile_template

    db = str(tmp_path / "events.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE SystemEvents (Message TEXT, Facility INTEGER, "
        "FromHost TEXT, SysLogTag TEXT)"
    )
    con.commit()
    con.close()

    df = spark.createDataFrame(
        [("it's a msg", 3, "h1", "app:"), ("plain", 4, "h2", "db:")],
        "msg string, facility int, hostname string, syslogtag string",
    )
    # stdsql escaping (quote doubling) — SQLite speaks standard SQL;
    # the `sql` option is the MySQL backslash dialect (StdPgSQLFmt
    # uses stdsql for the same reason, runtime/rsconf.c:229)
    tpl = ("insert into SystemEvents (Message, Facility, FromHost, "
           "SysLogTag) values ('%msg:::stdsql%', %syslogfacility%, "
           "'%hostname:::stdsql%', '%syslogtag:::stdsql%')")
    stmts = df.select(compile_template(tpl).alias("sql"))
    n = omsql_statements(stmts, db, batch_id="b1")
    assert n == 2
    con = sqlite3.connect(db)
    rows = con.execute(
        "SELECT Message, Facility, FromHost FROM SystemEvents "
        "ORDER BY Facility"
    ).fetchall()
    # the stdsql template option escaped the quote
    assert rows == [("it's a msg", 3, "h1"), ("plain", 4, "h2")]

    # replaying the same batch_id is a committed no-op
    assert omsql_statements(stmts, db, batch_id="b1") == 0
    assert con.execute(
        "SELECT count(*) FROM SystemEvents").fetchone()[0] == 2

    # a failing statement mid-batch rolls EVERYTHING back
    bad = spark.createDataFrame(
        [("insert into SystemEvents (Message) values ('x')",),
         ("insert into NoSuchTable values (1)",)],
        "sql string",
    )
    with pytest.raises(Exception):
        omsql_statements(bad, db, batch_id="b2")
    assert con.execute(
        "SELECT count(*) FROM SystemEvents").fetchone()[0] == 2
    # ...and the failed batch_id did NOT journal: a fixed retry lands
    good = spark.createDataFrame(
        [("insert into SystemEvents (Message) values ('x')",)],
        "sql string",
    )
    assert omsql_statements(good, db, batch_id="b2") == 1
    assert con.execute(
        "SELECT count(*) FROM SystemEvents").fetchone()[0] == 3
    con.close()


def test_omsql_rows_and_stream_writer(spark, tmp_path):
    """Structured parameterized variant + the foreachBatch adapter's
    epoch idempotence."""
    import sqlite3

    from rsyslog_spark.sinks import omsql_rows, omsql_stream_writer

    db = str(tmp_path / "rows.db")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    assert omsql_rows(df, db, "t", batch_id=0) == 2
    # schema-derived table with right affinities; replay no-op
    assert omsql_rows(df, db, "t", batch_id=0) == 0
    writer = omsql_stream_writer(db, "t")
    writer(df, epoch_id=1)   # new epoch lands
    writer(df, epoch_id=1)   # replayed epoch skipped
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 4
    assert con.execute(
        "SELECT typeof(id), typeof(s), typeof(v) FROM t LIMIT 1"
    ).fetchone() == ("integer", "text", "real")
    con.close()


def test_omelasticsearch_bulk_reply_handling(spark):
    """checkResultBulkmode against a REAL local _bulk endpoint: per-
    item statuses map back to rows positionally, 429 bulk rejections
    re-POST as a smaller bulk (retryfailures), hard failures surface
    es_ok=false with the error JSON for errorfile/retry-ruleset
    routing (omelasticsearch.c:2028-2053)."""
    import http.server
    import json
    import threading

    from rsyslog_spark.sinks import (
        omelasticsearch_deliver, omelasticsearch_frame,
    )

    seen_bodies = []
    retried: dict = {}
    lock = threading.Lock()

    class Bulk(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            body = self.rfile.read(n).decode()
            lines = [l for l in body.split("\n") if l]
            items = []
            any_err = False
            with lock:
                seen_bodies.append(body)
                for i in range(0, len(lines), 2):
                    doc = lines[i + 1]
                    if "hardfail" in doc:
                        items.append({"index": {
                            "status": 400,
                            "error": {"type": "mapper_parsing_exception"},
                        }})
                        any_err = True
                    elif "flaky" in doc and doc not in retried:
                        retried[doc] = 1
                        items.append({"index": {
                            "status": 429,
                            "error": {"type": "es_rejected_execution"},
                        }})
                        any_err = True
                    else:
                        items.append({"index": {"status": 201}})
            reply = json.dumps(
                {"took": 1, "errors": any_err, "items": items}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(reply)))
            self.end_headers()
            self.wfile.write(reply)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Bulk)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [("d1", "ok doc"), ("d2", "flaky doc"),
             ("d3", "hardfail doc"), ("d4", "another ok")],
            "id string, msg string",
        ).coalesce(1)
        entries = df.join(
            omelasticsearch_frame(
                df, template='{"id":"%id%","m":"%msg:::json%"}',
                index="logs", id_template="%id%",
            ).withColumn("id", F.get_json_object(
                F.split("value", "\n")[0], "$.index._id")),
            "id",
        )
        out = {r.id: r for r in omelasticsearch_deliver(
            entries, f"http://127.0.0.1:{port}/_bulk", batch_size=10,
        ).collect()}
        assert out["d1"].es_ok and out["d1"].es_status == 201
        assert out["d4"].es_ok
        # the 429 row was re-POSTed and landed on the retry
        assert out["d2"].es_ok and out["d2"].es_status == 201
        # hard failure surfaces the reply error for routing
        assert not out["d3"].es_ok and out["d3"].es_status == 400
        assert "mapper_parsing" in out["d3"].es_error
        # retry bulk contained ONLY the rejected entry
        with lock:
            assert len(seen_bodies) == 2
            assert "flaky" in seen_bodies[1]
            assert "hardfail" not in seen_bodies[1]
    finally:
        srv.shutdown()


# ---------------- kafka wire protocol ----------------

def test_kafka_wire_primitives():
    """CRC32C against the published check value, zigzag varints, and
    record-batch v2 round-trip with headers/nulls/timestamps (KIP-98
    layout; the reference delegates this to librdkafka)."""
    import pytest

    from rsyslog_spark.kafka_wire import (
        crc32c, decode_record_batch, decode_varint,
        encode_record_batch, encode_varint,
    )

    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    for v in (0, 1, -1, 63, 64, -64, -65, 300, -300, 2**31, -2**31):
        buf = encode_varint(v)
        got, pos = decode_varint(buf, 0)
        assert got == v and pos == len(buf)

    recs = [
        (b"k1", b"hello", [("h1", b"x"), ("h2", None)], 1000),
        (None, b"world", [], 1500),
        (b"k3", None, [("a", b"")], 2000),
    ]
    batch = encode_record_batch(recs, base_offset=7, base_timestamp_ms=1000)
    d = decode_record_batch(batch)
    assert d["base_offset"] == 7 and d["records"] == recs
    assert d["max_timestamp_ms"] == 2000
    # the batch header fields sit at their spec'd offsets
    import struct

    assert struct.unpack_from(">q", batch, 0)[0] == 7  # baseOffset
    # magic sits after baseOffset(8) + batchLength(4) + leaderEpoch(4)
    assert batch[16] == 2
    # CRC detects corruption
    bad = bytearray(batch)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batch(bytes(bad))


def test_omkafka_produce_over_socket(spark):
    """End-to-end over a REAL TCP socket: DataFrame → produce-request
    frames → a loopback broker reads the length-prefixed request,
    CRC-verifies and decodes the record batch, and replies with a
    Produce v7 response the client parser understands."""
    import socket
    import struct
    import threading

    from rsyslog_spark.kafka_wire import (
        decode_record_batch, omkafka_batches, parse_produce_response,
    )

    received = []
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]

    def recv_exact(c, n):
        buf = b""
        while len(buf) < n:
            b = c.recv(n - len(buf))
            if not b:
                return None
            buf += b
        return buf

    def broker():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            with conn:
                while True:
                    hdr = recv_exact(conn, 4)
                    if hdr is None:
                        break
                    size = struct.unpack(">i", hdr)[0]
                    msg = recv_exact(conn, size)
                    api, ver, corr = struct.unpack_from(">hhi", msg, 0)
                    assert (api, ver) == (0, 7)
                    # skip client_id, transactional_id, acks, timeout
                    pos = 8
                    cl = struct.unpack_from(">h", msg, pos)[0]
                    pos += 2 + cl
                    tl = struct.unpack_from(">h", msg, pos)[0]
                    pos += 2 + max(0, tl) + 2 + 4 + 4
                    tlen = struct.unpack_from(">h", msg, pos)[0]
                    pos += 2
                    topic = msg[pos : pos + tlen].decode()
                    pos += tlen + 4
                    part = struct.unpack_from(">i", msg, pos)[0]
                    pos += 4
                    blen = struct.unpack_from(">i", msg, pos)[0]
                    pos += 4
                    batch = msg[pos : pos + blen]
                    received.append(
                        (topic, part, decode_record_batch(batch))
                    )
                    body = (
                        struct.pack(">i", corr) + struct.pack(">i", 1)
                        + struct.pack(">h", tlen) + topic.encode()
                        + struct.pack(">i", 1)
                        + struct.pack(">ihqqq", part, 0, 100, -1, 0)
                    )
                    conn.sendall(struct.pack(">i", len(body)) + body)

    threading.Thread(target=broker, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [(f"key{i % 3}", f"event number {i}") for i in range(30)],
            "k string, v string",
        ).coalesce(1)
        frames = omkafka_batches(
            df, "logs", value_col="v", key_col="k",
            n_partitions=3, max_records=100,
        ).collect()
        assert {r.partition for r in frames} <= {0, 1, 2}
        assert sum(r.n_records for r in frames) == 30
        # drive every frame through the socket, parse the responses
        sock = socket.create_connection(("127.0.0.1", port))
        try:
            for fr in frames:
                sock.sendall(bytes(fr.request))
                hdr = recv_exact(sock, 4)
                size = struct.unpack(">i", hdr)[0]
                resp = hdr + recv_exact(sock, size)
                r = parse_produce_response(resp)
                assert r["error_code"] == 0 and r["base_offset"] == 100
                assert r["topic"] == "logs"
        finally:
            sock.close()
        # the broker decoded every record byte-identically
        got = sorted(
            rec[1].decode()
            for _t, _p, d in received for rec in d["records"]
        )
        assert got == sorted(f"event number {i}" for i in range(30))
        # keyed partitioning is consistent: one partition per key
        bykey: dict = {}
        for _t, p, d in received:
            for k, _v, _h, _ts in d["records"]:
                bykey.setdefault(k, set()).add(p)
        assert all(len(ps) == 1 for ps in bykey.values())
    finally:
        srv.close()


# ---------------- RELP ----------------

def _relp_server(received, nack_substr=None):
    """A loopback RELP peer: negotiates open offers, acks syslog
    frames (500-NACKs messages containing nack_substr), closes
    cleanly. Returns (port, shutdown)."""
    import socket
    import threading

    from rsyslog_spark.relp import RelpParser, relp_frame

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]

    def handle(conn):
        parser = RelpParser()
        with conn:
            while True:
                try:
                    data = conn.recv(65536)
                except OSError:
                    return
                if not data:
                    return
                for txnr, command, payload in parser.feed(data):
                    if command == "open":
                        assert b"relp_version=0" in payload
                        assert b"commands=syslog" in payload
                        conn.sendall(relp_frame(
                            txnr, "rsp",
                            b"200 OK\nrelp_version=0\ncommands=syslog",
                        ))
                    elif command == "syslog":
                        msg = payload.decode()
                        if nack_substr and nack_substr in msg:
                            conn.sendall(relp_frame(
                                txnr, "rsp", b"500 rejected"))
                        else:
                            received.append(msg)
                            conn.sendall(relp_frame(txnr, "rsp", b"200 OK"))
                    elif command == "close":
                        conn.sendall(relp_frame(txnr, "rsp", b"200 OK"))
                        conn.sendall(relp_frame(0, "serverclose", b"0"))
                        return

    def serve():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=handle, args=(conn,),
                             daemon=True).start()

    threading.Thread(target=serve, daemon=True).start()
    return port, srv.close


def test_relp_frame_parser():
    """RELP framing per spec: HDR SP DATA LF, zero-datalen frames,
    frames split across reads, back-to-back frames in one read."""
    import pytest

    from rsyslog_spark.relp import RelpParser, parse_rsp, relp_frame

    f = relp_frame(7, "syslog", b"<13>Jan  1 00:00:00 h tag: hi")
    assert f == b"7 syslog 29 <13>Jan  1 00:00:00 h tag: hi\n"
    assert relp_frame(3, "close", b"") == b"3 close 0\n"

    p = RelpParser()
    # split mid-header, mid-data
    assert p.feed(f[:5]) == []
    assert p.feed(f[5:20]) == []
    got = p.feed(f[20:] + b"8 rsp 6 200 OK\n9 close 0\n")
    assert got[0] == (7, "syslog", b"<13>Jan  1 00:00:00 h tag: hi")
    assert got[1] == (8, "rsp", b"200 OK")
    assert got[2] == (9, "close", b"")
    assert parse_rsp(b"200 OK\ncommands=syslog") == (200, "OK")
    with pytest.raises(ValueError, match="trailer"):
        RelpParser().feed(b"1 syslog 2 abX")


def test_omrelp_delivery_and_nack(spark):
    """omrelp against a REAL loopback RELP peer: open negotiation,
    per-message acks (the reliability RELP adds over plain TCP),
    NACK surfacing, pipelined window."""
    from rsyslog_spark.relp import omrelp

    received: list = []
    port, shutdown = _relp_server(received, nack_substr="poison")
    try:
        df = spark.createDataFrame(
            [(f"<13>Jan  1 00:00:0{i % 10} h tag: msg {i}",)
             for i in range(50)] + [("<13>poison pill",)],
            "line string",
        ).coalesce(1)
        out = omrelp(df, "127.0.0.1", port, msg_col="line", window=8)
        rows = out.collect()
        ok = [r for r in rows if r.relp_ok]
        bad = [r for r in rows if not r.relp_ok]
        assert len(ok) == 50
        assert len(bad) == 1 and bad[0].relp_code == 500
        assert "poison" in bad[0].line
        # every acked message actually ARRIVED, byte-identical
        assert sorted(received) == sorted(
            f"<13>Jan  1 00:00:0{i % 10} h tag: msg {i}"
            for i in range(50)
        )
    finally:
        shutdown()
