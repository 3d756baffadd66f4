"""Remaining input modules: imhttp (HTTP push ingest), improg
(external-program source), immark (heartbeat marks) — real runtime
listeners over stdlib servers/processes, spooling to the same
replayable file bridge as :mod:`rsyslog_spark.net` /
:mod:`rsyslog_spark.relp`.

imhttp (contrib/imhttp/imhttp.c): POST bodies to a configured
endpoint become messages — the body runs through the SAME RFC 6587
framing logic as imtcp (supportOctetCountedFraming, :584-672), gzip
Content-Encoding is inflated (:1319-1324), oversized bodies get 413
(:1334), non-POST 405 (:1300), and per-request metadata rides along
exactly where the reference puts it: ``$!metadata!httpheaders``
(lowercased header names, :442-487), ``$!metadata!queryparams``
(split on ``&``/``;``, :492-518), plus the remote address. Basic auth
and API-key auth return 401 (:1186-1203; the key is accepted from
``Authorization: ApiKey …`` or ``X-API-Key`` — Elastic sends either,
:966-987).

Because metadata is per-request, the imhttp spool is JSON-lines (one
object per message); :func:`imhttp_read` lifts it back into columns
(msg, headers map, query map, remote) for batch or readStream use.

improg (contrib/improg/improg.c): spawn a binary, each stdout line is
one message; with confirmMessages=on the module writes ``ACK\\n`` to
the child's stdin after each consumed line (:394-396) — back-pressure
by pipe buffer, exactly the reference's flow control.

immark (plugins/immark/immark.c): inject ``-- MARK --`` every
MarkMessagePeriod seconds (default 1200, :55) at LOG_SYSLOG|LOG_INFO
= PRI 46 (:283).
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame

from rsyslog_spark.net import SyslogFrameParser, _SpoolWriter

MAX_REQUEST_BODY = 64 * 1024 * 1024


class ImHttpListener:
    """HTTP push-ingest endpoint. ``basic_auth`` is a set of
    ``user:password`` strings (the htpasswd-file analog);
    ``api_keys`` a set of accepted keys. ``health_path`` answers 200
    unauthenticated (healthCheckPath)."""

    def __init__(self, spool_dir: str, endpoint: str = "/ingest",
                 host: str = "127.0.0.1", port: int = 0,
                 health_path: str = "/healthz",
                 basic_auth: set[str] | None = None,
                 api_keys: set[str] | None = None,
                 support_octet_counted: bool = True,
                 max_body: int = MAX_REQUEST_BODY,
                 rotate_every: int = 10_000) -> None:
        import http.server

        self.n_received = 0
        self.n_failed = 0
        self._lock = threading.Lock()
        spool = _SpoolWriter(spool_dir, "http", rotate_every)
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int) -> None:
                self.send_response(code)
                self.send_header("Content-Length", "0")
                if code != 200:
                    self.send_header("Connection", "close")
                self.end_headers()

            def _authorized(self) -> bool:
                if not basic_auth and not api_keys:
                    return True
                if basic_auth:
                    import base64

                    h = self.headers.get("Authorization", "")
                    if h.startswith("Basic "):
                        try:
                            tok = base64.b64decode(
                                h[6:].strip()
                            ).decode("utf-8", "replace")
                        except Exception:
                            tok = ""
                        if tok in basic_auth:
                            return True
                if api_keys:
                    h = self.headers.get("Authorization", "")
                    if h.startswith("ApiKey ") and h[7:].strip() in api_keys:
                        return True
                    if self.headers.get("X-API-Key", "").strip() in api_keys:
                        return True
                return False

            def do_GET(self):
                if self.path == health_path:
                    self._reply(200)
                else:
                    self._reply(405)

            def do_POST(self):
                if self.path.split("?", 1)[0] != endpoint:
                    self._reply(404)
                    return
                if not self._authorized():
                    self.send_response(401)
                    if basic_auth:
                        self.send_header(
                            "WWW-Authenticate", 'Basic realm="imhttp"'
                        )
                    self.send_header("Content-Length", "0")
                    self.send_header("Connection", "close")
                    self.end_headers()
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                except ValueError:
                    n = 0
                if n > max_body:
                    with outer._lock:
                        outer.n_failed += 1
                    self._reply(413)
                    return
                body = self.rfile.read(n)
                if self.headers.get(
                    "Content-Encoding", ""
                ).lower() == "gzip":
                    import gzip

                    try:
                        body = gzip.decompress(body)
                    except OSError:
                        with outer._lock:
                            outer.n_failed += 1
                        self._reply(400)
                        return
                headers = {
                    k.lower(): v for k, v in self.headers.items()
                }
                query: dict[str, str] = {}
                if "?" in self.path:
                    import re

                    for kv in re.split(
                        "[&;]", self.path.split("?", 1)[1]
                    ):
                        if kv:
                            k, _, v = kv.partition("=")
                            query[k] = v
                msgs: list[bytes] = []
                if support_octet_counted:
                    p = SyslogFrameParser()
                    msgs = [m for m, _f, _e in p.feed(body) if m]
                    tail = p.flush()
                    if tail:
                        msgs.append(tail)
                else:
                    msgs = [
                        ln for ln in body.split(b"\n") if ln
                    ]
                for m in msgs:
                    rec = {
                        "msg": m.decode("utf-8", "replace"),
                        "headers": headers,
                        "query": query,
                        "remote": self.client_address[0],
                    }
                    spool.write(
                        json.dumps(rec, sort_keys=True).encode()
                    )
                    with outer._lock:
                        outer.n_received += 1
                self._reply(200)

        self._srv = http.server.ThreadingHTTPServer(
            (host, port), Handler
        )
        self.port = self._srv.server_address[1]
        self._spool = spool
        threading.Thread(
            target=self._srv.serve_forever, daemon=True
        ).start()

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        self._spool.close()


def imhttp_read(spark, spool_dir: str, stream: bool = False) -> DataFrame:
    """Lift the imhttp JSONL spool into columns mirroring the
    reference's message shape: msg plus $!metadata!httpheaders /
    $!metadata!queryparams as map columns and the remote address."""
    import pyspark.sql.functions as F

    reader = (
        spark.readStream if stream else spark.read
    )
    df = reader.text(spool_dir + "/*.log")
    sch = (
        "msg string, headers map<string,string>, "
        "query map<string,string>, remote string"
    )
    j = F.from_json(F.col("value"), sch)
    return df.select(
        j.getField("msg").alias("msg"),
        j.getField("headers").alias("httpheaders"),
        j.getField("query").alias("queryparams"),
        j.getField("remote").alias("fromhost_ip"),
    )


class ImProgListener:
    """Run ``argv`` and turn each stdout line into one message.
    ``confirm_messages=True`` writes ``ACK\\n`` to the child's stdin
    after every consumed line (improg.c:394-396). ``close()`` closes
    stdin, waits ``close_timeout`` seconds, then kills when
    ``kill_unresponsive`` (improg.c:297 semantics)."""

    def __init__(self, spool_dir: str, argv: list[str],
                 confirm_messages: bool = False,
                 close_timeout: float = 5.0,
                 kill_unresponsive: bool = True,
                 rotate_every: int = 10_000) -> None:
        import subprocess

        self.n_received = 0
        self._lock = threading.Lock()
        self.confirm = confirm_messages
        self.close_timeout = close_timeout
        self.kill_unresponsive = kill_unresponsive
        self._spool = _SpoolWriter(spool_dir, "prog", rotate_every)
        self._proc = subprocess.Popen(
            argv,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _pump(self) -> None:
        for line in self._proc.stdout:
            msg = line.rstrip(b"\n")
            if not msg:
                continue
            self._spool.write(msg)
            with self._lock:
                self.n_received += 1
            if self.confirm:
                try:
                    self._proc.stdin.write(b"ACK\n")
                    self._proc.stdin.flush()
                except (BrokenPipeError, ValueError):
                    pass
        self._spool.close()

    def close(self) -> None:
        import subprocess

        try:
            self._proc.stdin.close()
        except OSError:
            pass
        try:
            self._proc.wait(timeout=self.close_timeout)
        except subprocess.TimeoutExpired:
            if self.kill_unresponsive:
                self._proc.kill()
                self._proc.wait()
        self._thread.join(timeout=5.0)


class MarkEmitter:
    """immark: write ``<46>-- MARK --`` (LOG_SYSLOG|LOG_INFO) to the
    spool every ``period`` seconds until closed."""

    def __init__(self, spool_dir: str, period: float = 1200.0,
                 mark_text: str = "-- MARK --",
                 rotate_every: int = 10_000) -> None:
        self.n_emitted = 0
        self._stop = threading.Event()
        self._spool = _SpoolWriter(spool_dir, "mark", rotate_every)
        self._period = period
        self._line = f"<46>{mark_text}".encode()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.wait(self._period):
            self._spool.write(self._line)
            self.n_emitted += 1
        self._spool.close()

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)
