"""ommail SMTP delivery and omuxsock unix-datagram sink, against real
loopback servers (the r5 wire-protocol test pattern)."""

import socket
import threading

import pytest

from rsyslog_spark.mail import (
    _escape_dots,
    _header_value,
    mail_message,
    ommail_send,
    smtp_timestamp,
)
from rsyslog_spark.net import omuxsock_send


# ---------------- message shaping (ommail.c:488-668) ----------------

def test_smtp_timestamp_format():
    # 2024-01-02 03:04:05 UTC is a Tuesday; day-of-month space-padded
    assert smtp_timestamp(1704164645) == (
        "Date: Tue,  2 Jan 2024 03:04:05 +0000\r\n"
    )


def test_header_value_strips_crlf():
    assert _header_value("a\r\nb\nc") == "a  b c"


def test_escape_dots_line_start_semantics():
    # start-of-message dot doubles; after CRLF doubles; after bare LF
    # (no CR) the reference does NOT treat it as a new line
    assert _escape_dots(".x") == "..x"
    assert _escape_dots("a\r\n.b") == "a\r\n..b"
    assert _escape_dots("a\n.b") == "a\n.b"
    assert _escape_dots("a.b") == "a.b"


def test_mail_message_layout():
    msg = mail_message(
        "a@x", ["b@y", "c@z"], "Sub\r\nject", "body\r\n.end",
        epoch_s=1704164645,
    ).decode()
    lines = msg.split("\r\n")
    assert lines[0] == "Date: Tue,  2 Jan 2024 03:04:05 +0000"
    assert lines[1] == "From: <a@x>"
    assert lines[2] == "To: <b@y>, <c@z>"
    assert lines[3] == "Subject: Sub  ject"  # CR and LF each -> space
    assert lines[4] == "X-Mailer: rsyslog-ommail"
    assert lines[5] == ""
    assert lines[6] == "body" and lines[7] == "..end"


def test_mail_message_no_body():
    msg = mail_message("a@x", ["b@y"], "s", "body", 0, enable_body=False)
    assert msg.endswith(b"X-Mailer: rsyslog-ommail\r\n\r\n")


# ---------------- SMTP dialog round-trip ----------------

class _SmtpServer(threading.Thread):
    """Minimal RFC5321 responder capturing envelope + DATA bytes."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self.messages = []
        self.envelopes = []
        self.stop = False

    def run(self):
        while not self.stop:
            try:
                c, _ = self.sock.accept()
            except OSError:
                return
            with c, c.makefile("rb") as f:
                c.sendall(b"220 test ESMTP\r\n")
                env = {"rcpt": []}
                while True:
                    line = f.readline()
                    if not line:
                        break
                    u = line.decode().strip()
                    if u.upper().startswith("HELO"):
                        env["helo"] = u.split(" ", 1)[1]
                        c.sendall(b"250 ok\r\n")
                    elif u.upper().startswith("MAIL FROM:"):
                        env["from"] = u[10:].strip("<>")
                        c.sendall(b"250 ok\r\n")
                    elif u.upper().startswith("RCPT TO:"):
                        env["rcpt"].append(u[8:].strip("<>"))
                        c.sendall(b"250 ok\r\n")
                    elif u.upper() == "DATA":
                        c.sendall(b"354 go\r\n")
                        buf = b""
                        while not buf.endswith(b"\r\n.\r\n"):
                            chunk = f.readline()
                            if not chunk:
                                break
                            buf += chunk
                        self.messages.append(buf[:-5])
                        self.envelopes.append(dict(env))
                        c.sendall(b"250 queued\r\n")
                    elif u.upper() == "QUIT":
                        c.sendall(b"221 bye\r\n")
                        break

    def close(self):
        self.stop = True
        self.sock.close()


def test_ommail_send_roundtrip(spark):
    srv = _SmtpServer()
    srv.start()
    try:
        df = spark.createDataFrame(
            [("disk full on h1", "ALERT h1", 1704164645),
             (".dot body", "ALERT h2", 1704164645)],
            "value string, subj string, ts long",
        ).coalesce(1)
        n = ommail_send(
            df, "127.0.0.1", srv.port, "rsyslog@example.org",
            ["ops@example.org", "oncall@example.org"],
            body_col="value", subject_col="subj", ts_col="ts",
        )
        assert n == 2
        assert len(srv.messages) == 2
        assert srv.envelopes[0]["from"] == "rsyslog@example.org"
        assert srv.envelopes[0]["rcpt"] == [
            "ops@example.org", "oncall@example.org",
        ]
        joined = b"\n".join(sorted(srv.messages))
        assert b"Subject: ALERT h1" in joined
        assert b"X-Mailer: rsyslog-ommail" in joined
        # the leading dot arrived ESCAPED on the wire (captured before
        # de-stuffing, so the doubled dot is visible)
        assert b"\r\n\r\n..dot body" in joined
        assert b"Date: Tue,  2 Jan 2024 03:04:05 +0000" in joined
    finally:
        srv.close()


def test_ommail_bad_response_raises(spark):
    # a server that rejects MAIL FROM must fail the job (action
    # suspension semantics -> Spark task retry/abort)
    class Bad(_SmtpServer):
        def run(self):
            c, _ = self.sock.accept()
            with c:
                c.sendall(b"220 hi\r\n")
                c.makefile("rb").readline()  # HELO
                c.sendall(b"550 no\r\n")

    srv = Bad()
    srv.start()
    try:
        df = spark.createDataFrame([("x",)], "value string").coalesce(1)
        with pytest.raises(Exception, match="SMTP|550|expected"):
            ommail_send(df, "127.0.0.1", srv.port, "a@x", ["b@y"])
    finally:
        srv.close()


# ---------------- omuxsock ----------------

def test_omuxsock_dgram_roundtrip(spark, tmp_path):
    path = str(tmp_path / "ux.sock")
    rx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    rx.bind(path)
    rx.settimeout(10)
    try:
        df = spark.createDataFrame(
            [("<13>Jan  1 00:00:00 h app: m1",),
             ("<13>Jan  1 00:00:00 h app: m2",)],
            "value string",
        ).coalesce(1)
        n = omuxsock_send(df, path)
        assert n == 2
        got = sorted(rx.recv(65536) for _ in range(2))
        assert got[0].endswith(b"m1") and got[1].endswith(b"m2")
    finally:
        rx.close()
