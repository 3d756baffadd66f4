"""Plain-TCP/UDP syslog transport: imtcp/imudp framing + omfwd send.

The framing state machine mirrors the reference's processDataRcvd
(runtime/tcps_sess.c:590-740): framing auto-detects PER FRAME — a
leading digit starts RFC 6587 octet counting (digits accumulate into
the length until a non-digit, which SHOULD be SP; a non-SP delimiter
or a zero count is a logged framing error, and processing continues),
anything else is octet stuffing (LF-terminated, the traditional
syslog/TCP framing). Both can interleave on one connection.

:class:`SyslogTcpListener` / :class:`SyslogUdpListener` are the
imtcp/imudp sockets with the same spool-then-stream bridge as
:class:`rsyslog_spark.relp.RelpListener` (Structured Streaming
sources must be replayable; a raw socket is not — the spool file is
the replay log). :func:`omfwd_send` is omfwd's doAction made real:
per-partition persistent TCP connection (or UDP datagrams) writing
:func:`rsyslog_spark.sinks.omfwd_frame` bytes.

Both TCP ends take a :class:`rsyslog_spark.tls.TlsConfig` to run the
reference's stream-driver TLS layer (StreamDriver.Mode=1 with
anon / x509/certvalid / x509/fingerprint / x509/name auth modes).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame

MAX_OCTET_COUNT = 200_000_000  # tcps_sess.c:713 cap


class SyslogFrameParser:
    """Incremental RFC 6587 frame extractor with the reference's
    per-frame auto-detection. ``feed`` returns (message, framing,
    error) tuples — error carries the reference's logged framing
    complaints (non-SP delimiter / invalid count), with the message
    still delivered like the reference does."""

    def __init__(self, max_line: int = 64 * 1024) -> None:
        self._buf = b""
        self.max_line = max_line

    def feed(self, data: bytes) -> list[tuple[bytes, str, str | None]]:
        self._buf += data
        out = []
        while True:
            got = self._try_frame()
            if got is None:
                return out
            out.append(got)

    def _try_frame(self):
        buf = self._buf
        if not buf:
            return None
        c = buf[0:1]
        if c == b" ":
            # Cisco ASA SP-after-LF fix (tcps_sess.c:614-620)
            self._buf = buf[1:]
            return self._try_frame()
        if c.isdigit():
            # octet counting: digits then SP then exactly N bytes
            i = 1
            while i < len(buf) and buf[i : i + 1].isdigit():
                i += 1
            if i >= len(buf):
                return None  # count still incomplete
            err = None
            n = int(buf[:i])
            if n > MAX_OCTET_COUNT:
                n = MAX_OCTET_COUNT
            delim = buf[i : i + 1]
            if delim != b" ":
                err = (
                    f"framing error: delimiter is not SP but ASCII "
                    f"{delim[0]}"
                )
                # reference continues with the count consumed and the
                # non-SP byte as message data
                start = i
            else:
                start = i + 1
            if n < 1:
                err = f"framing error: invalid octet count {n}"
                self._buf = buf[start:]
                return b"", "octet-counted", err
            if len(buf) - start < n:
                return None
            msg = buf[start : start + n]
            self._buf = buf[start + n :]
            return msg[: self.max_line], "octet-counted", err
        nl = buf.find(b"\n")
        if nl < 0:
            return None
        msg = buf[:nl]
        self._buf = buf[nl + 1 :]
        return msg[: self.max_line], "octet-stuffing", None

    def flush(self) -> bytes | None:
        """Connection closed: an unterminated stuffing frame is the
        final message (the reference submits the residual buffer on
        session close)."""
        if self._buf and not self._buf[0:1].isdigit():
            msg, self._buf = self._buf, b""
            return msg
        return None


def compress_message(msg: bytes, level: int = 6) -> bytes:
    """Sender side of the legacy syslog compression extension: 'z' +
    zlib stream (what uncompressMessage expects)."""
    import zlib

    return b"z" + zlib.compress(msg, level)


def uncompress_message(
    msg: bytes, max_line: int = 64 * 1024
) -> tuple[bytes | None, str | None]:
    """runtime/parser.c:262 uncompressMessage: a message whose first
    byte is 'z' is zlib-compressed; inflate it with a hard output cap
    (the reference refuses to inflate beyond iMaxLine — decompression
    bombs are a DoS vector). Returns (message, error): a failed or
    over-limit inflate drops the message (None) with the error noted,
    exactly the reference's log-and-ignore. Non-'z' messages pass
    through untouched."""
    import zlib

    if not msg or msg[0:1] != b"z":
        return msg, None
    try:
        d = zlib.decompressobj()
        out = d.decompress(msg[1:], max_line + 1)
        if len(out) > max_line or d.unconsumed_tail:
            return None, (
                f"uncompressed message exceeds max line {max_line} "
                "- message ignored"
            )
        return out, None
    except zlib.error as e:
        return None, f"uncompression of a message failed ({e}) - ignored"


class _SpoolWriter:
    def __init__(self, spool_dir: str, prefix: str,
                 rotate_every: int) -> None:
        import os

        os.makedirs(spool_dir, exist_ok=True)
        self.dir = spool_dir
        self.prefix = prefix
        self.rotate = rotate_every
        self._f = None
        self._n_file = 0
        self._n = 0

    def write(self, msg: bytes) -> None:
        import os

        if self._f is None:
            self._f = open(
                os.path.join(
                    self.dir, f"{self.prefix}-{self._n_file:06d}.log"
                ),
                "ab",
            )
        self._f.write(msg.replace(b"\n", b" ") + b"\n")
        self._f.flush()
        self._n += 1
        if self._n >= self.rotate:
            self._f.close()
            self._f, self._n_file, self._n = None, self._n_file + 1, 0

    def close(self) -> None:
        if self._f is not None:
            self._f.close()


class SyslogTcpListener:
    """imtcp: accept TCP connections, extract frames with the
    per-frame auto-detecting parser, spool newline-delimited messages
    for the streaming reader.

    ``tls`` enables the stream-driver TLS layer (imtcp
    StreamDriver.Mode=1): the handshake runs per session, and with
    fingerprint/name auth modes the session is terminated before any
    frame is processed when the client certificate is not authorized
    (osslChkPeerAuth semantics — see :mod:`rsyslog_spark.tls`).
    Rejections land in ``auth_errors``."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1",
                 port: int = 0, rotate_every: int = 10_000,
                 support_compression: bool = True,
                 tls=None) -> None:
        import socket as socketlib
        import threading

        self.spool_dir = spool_dir
        self.rotate_every = rotate_every
        self.support_compression = support_compression
        self.n_received = 0
        self.framing_errors: list[str] = []
        self.auth_errors: list[str] = []
        self.tls = tls
        self._tls_ctx = None
        if tls is not None:
            from rsyslog_spark.tls import make_server_context

            self._tls_ctx = make_server_context(tls)
        self._lock = threading.Lock()
        self._n_sessions = 0
        self._srv = socketlib.socket(
            socketlib.AF_INET, socketlib.SOCK_STREAM
        )
        self._srv.setsockopt(
            socketlib.SOL_SOCKET, socketlib.SO_REUSEADDR, 1
        )
        self._srv.bind((host, port))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self) -> None:
        import threading

        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            with self._lock:
                self._n_sessions += 1
                sid = self._n_sessions
            threading.Thread(
                target=self._session, args=(conn, sid), daemon=True
            ).start()

    def _session(self, conn, sid: int) -> None:
        if self._tls_ctx is not None:
            import ssl as ssllib

            from rsyslog_spark.tls import check_peer

            try:
                conn = self._tls_ctx.wrap_socket(conn, server_side=True)
            except (ssllib.SSLError, OSError) as e:
                with self._lock:
                    self.auth_errors.append(f"TLS handshake failed: {e}")
                return
            der = conn.getpeercert(binary_form=True)
            ok, detail = check_peer(der, conn.getpeercert(), self.tls)
            if not ok:
                with self._lock:
                    self.auth_errors.append(
                        f"TLS session terminated: {detail}"
                    )
                conn.close()
                return
        parser = SyslogFrameParser()
        spool = _SpoolWriter(
            self.spool_dir, f"tcp-{sid:04d}", self.rotate_every
        )
        try:
            with conn:
                while True:
                    try:
                        data = conn.recv(65536)
                    except OSError:
                        return
                    if not data:
                        tail = parser.flush()
                        if tail is not None:
                            spool.write(tail)
                            with self._lock:
                                self.n_received += 1
                        return
                    for msg, _framing, err in parser.feed(data):
                        if err:
                            with self._lock:
                                self.framing_errors.append(err)
                        if msg and self.support_compression:
                            msg, zerr = uncompress_message(msg)
                            if zerr:
                                with self._lock:
                                    self.framing_errors.append(zerr)
                        if msg:
                            spool.write(msg)
                            with self._lock:
                                self.n_received += 1
        finally:
            spool.close()

    def close(self) -> None:
        self._srv.close()


class SyslogUdpListener:
    """imudp: one datagram = one message (no framing)."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1",
                 port: int = 0, rotate_every: int = 10_000) -> None:
        import socket as socketlib
        import threading

        self.n_received = 0
        self._lock = threading.Lock()
        self._sock = socketlib.socket(
            socketlib.AF_INET, socketlib.SOCK_DGRAM
        )
        self._sock.bind((host, port))
        self.port = self._sock.getsockname()[1]
        self._spool = _SpoolWriter(spool_dir, "udp", rotate_every)
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self) -> None:
        while True:
            try:
                data, _ = self._sock.recvfrom(65536)
            except OSError:
                self._spool.close()
                return
            self._spool.write(data.rstrip(b"\n"))
            with self._lock:
                self.n_received += 1

    def close(self) -> None:
        self._sock.close()


def omfwd_send(
    df: DataFrame,
    host: str,
    port: int,
    protocol: str = "tcp",
    value_col: str = "value",
    tls=None,
) -> int:
    """omfwd's doAction made real (tools/omfwd.c TCPSend/UDPSend):
    ship pre-framed wire bytes (see sinks.omfwd_frame) over one
    persistent TCP connection per partition, or as one UDP datagram
    per message. Driver-visible return: messages sent. A TCP transport
    error fails the partition → Spark retries (the reference suspends
    the action and replays from the queue).

    ``tls`` (a :class:`rsyslog_spark.tls.TlsConfig`) enables the
    omfwd StreamDriver TLS mode: the client also AUTHENTICATES the
    server per auth_mode/permitted_peers (the reference checks both
    directions — nsd_ossl.c osslChkPeerAuth runs in the client
    handshake too); an unauthorized server fails the partition."""
    import pyspark.sql.types as T

    if protocol not in ("tcp", "udp"):
        raise ValueError("protocol must be tcp|udp")
    if tls is not None and protocol != "tcp":
        raise ValueError("tls requires protocol='tcp'")

    def send(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket as socketlib

        sock = None
        n = 0
        try:
            for pdf in batches:
                vals = pdf[value_col].tolist()
                if vals and sock is None:
                    if protocol == "tcp":
                        sock = socketlib.create_connection(
                            (host, port), timeout=10.0
                        )
                        if tls is not None:
                            from rsyslog_spark.tls import (
                                check_peer,
                                make_client_context,
                            )

                            ctx = make_client_context(tls)
                            sock = ctx.wrap_socket(
                                sock, server_hostname=host
                            )
                            ok, detail = check_peer(
                                sock.getpeercert(binary_form=True),
                                sock.getpeercert(),
                                tls,
                            )
                            if not ok:
                                raise RuntimeError(
                                    "TLS session terminated with "
                                    f"remote syslog server: {detail}"
                                )
                    else:
                        sock = socketlib.socket(
                            socketlib.AF_INET, socketlib.SOCK_DGRAM
                        )
                for v in vals:
                    b = v.encode("utf-8") if isinstance(v, str) else v
                    if protocol == "tcp":
                        sock.sendall(b)
                    else:
                        sock.sendto(b, (host, port))
                    n += 1
            yield pd.DataFrame({"n_sent": [n]})
        finally:
            if sock is not None:
                sock.close()

    out = df.mapInPandas(
        send, T.StructType([T.StructField("n_sent", T.LongType())])
    )
    return int(
        out.agg({"n_sent": "sum"}).first()[0] or 0
    )


def omuxsock_send(
    df: DataFrame,
    path: str,
    value_col: str = "value",
    dgram: bool = True,
    abstract: bool = False,
) -> int:
    """omuxsock (plugins/omuxsock/omuxsock.c): ship each rendered
    message as one AF_UNIX datagram (sendMsg :441 — sendto per
    message, SOCK_DGRAM default :178; dgram=False uses a connected
    SOCK_STREAM like the module's STREAM option). ``abstract=True``
    maps the Linux abstract-namespace form (leading NUL, :389).
    One socket per partition; returns messages sent."""
    import pyspark.sql.types as T

    addr = ("\0" + path) if abstract else path

    def send(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket as socketlib

        sock = None
        n = 0
        try:
            for pdf in batches:
                vals = pdf[value_col].tolist()
                if vals and sock is None:
                    kind = (
                        socketlib.SOCK_DGRAM if dgram
                        else socketlib.SOCK_STREAM
                    )
                    sock = socketlib.socket(socketlib.AF_UNIX, kind)
                    if not dgram:
                        sock.connect(addr)
                for v in vals:
                    b = v.encode("utf-8") if isinstance(v, str) else v
                    if dgram:
                        sock.sendto(b, addr)
                    else:
                        sock.sendall(b)
                    n += 1
            yield pd.DataFrame({"n_sent": [n]})
        finally:
            if sock is not None:
                sock.close()

    out = df.select(value_col).mapInPandas(
        send, T.StructType([T.StructField("n_sent", T.LongType())])
    )
    return int(out.agg({"n_sent": "sum"}).first()[0] or 0)


def _trusted_props(pid: int) -> dict[str, str]:
    """imuxsock's journald-inspired trusted properties from /proc
    (plugins/imuxsock/imuxsock.c getTrustedProp:793 / getTrustedExe:
    836): comm and cmdline read from /proc/<pid>/, control chars →
    space, truncated at first LF; exe via readlink. Missing entries
    (process gone, permission) are silently skipped, like the
    reference's RS_RET_ERR path."""
    import os

    out: dict[str, str] = {}
    for prop in ("comm", "cmdline"):
        try:
            raw = open(f"/proc/{pid}/{prop}", "rb").read(1023)
        except OSError:
            continue
        buf = []
        for b in raw:
            if b == 0x0A:
                break
            buf.append(" " if b < 0x20 or b == 0x7F else chr(b))
        # cmdline uses NUL separators — the ctrl-char rule turns them
        # into spaces (same visible behavior as the reference)
        out[prop] = "".join(buf).rstrip(" ")
    try:
        import os as _os

        out["exe"] = _os.readlink(f"/proc/{pid}/exe")
    except OSError:
        pass
    return out


def _escape_trusted(val: str) -> str:
    """copyescaped (imuxsock.c:861): quoted, with '"' and '\\'
    backslash-escaped."""
    return '"' + val.replace("\\", "\\\\").replace('"', '\\"') + '"'


def annotate_trusted(msg: bytes, pid: int, uid: int, gid: int) -> bytes:
    """The Annotate=on raw-message extension (imuxsock.c:1017-1082):
    append ``' @[_PID=p _UID=u _GID=g _COMM=c _EXE=e _CMDLINE="…"]'``
    — _COMM/_EXE plain, _CMDLINE quoted+escaped."""
    props = _trusted_props(pid)
    parts = [f"_PID={pid} _UID={uid} _GID={gid}"]
    if "comm" in props:
        parts.append(f"_COMM={props['comm']}")
    if "exe" in props:
        parts.append(f"_EXE={props['exe']}")
    if "cmdline" in props:
        parts.append(f"_CMDLINE={_escape_trusted(props['cmdline'])}")
    return msg + (" @[" + " ".join(parts) + "]").encode()


class SyslogUnixListener:
    """imuxsock (plugins/imuxsock/imuxsock.c): the classic Linux
    /dev/log source — AF_UNIX SOCK_DGRAM with SO_PASSCRED, one
    datagram per message, SCM_CREDENTIALS giving the sender's REAL
    (pid, uid, gid) as vouched by the kernel.

    ``annotate=True`` mirrors Annotate=on: the trusted properties are
    appended to the raw message as the ``@[_PID=… _UID=… …]`` block
    (imuxsock.c:1036) — parse it downstream with
    :func:`parse_trusted_props` (the ParseTrusted=on twin, which the
    reference applies at ingest into ``$!`` — here it is a pure
    Column op on the replayable spool, same fields).
    ``discard_own=True`` drops datagrams from this process's own pid
    (bDiscardOwnMsgs, imuxsock.c:1009)."""

    def __init__(self, spool_dir: str, path: str,
                 rotate_every: int = 10_000, annotate: bool = True,
                 discard_own: bool = False) -> None:
        import os
        import socket as socketlib
        import struct
        import threading

        self.n_received = 0
        self.path = path
        self._lock = threading.Lock()
        self._own_pid = os.getpid()
        self._annotate = annotate
        self._discard_own = discard_own
        self._struct = struct
        self._sock = socketlib.socket(
            socketlib.AF_UNIX, socketlib.SOCK_DGRAM
        )
        self._sock.bind(path)
        self._sock.setsockopt(
            socketlib.SOL_SOCKET, socketlib.SO_PASSCRED, 1
        )
        self._spool = _SpoolWriter(spool_dir, "uxsock", rotate_every)
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self) -> None:
        import socket as socketlib

        while True:
            try:
                data, ancdata, _flags, _addr = self._sock.recvmsg(
                    65536, socketlib.CMSG_SPACE(12)
                )
            except OSError:
                self._spool.close()
                return
            cred = None
            for level, ctype, cdata in ancdata:
                if (
                    level == socketlib.SOL_SOCKET
                    and ctype == socketlib.SCM_CREDENTIALS
                ):
                    cred = self._struct.unpack("iII", cdata[:12])
            msg = data.rstrip(b"\n").rstrip(b"\x00")
            if cred is not None:
                if self._discard_own and cred[0] == self._own_pid:
                    continue
                if self._annotate:
                    msg = annotate_trusted(msg, *cred)
            self._spool.write(msg)
            with self._lock:
                self.n_received += 1

    def close(self) -> None:
        import os

        self._sock.close()
        try:
            os.unlink(self.path)
        except OSError:
            pass


def parse_trusted_props(msg: Column) -> Column:
    """ParseTrusted=on as a downstream Column op: split the
    ``@[_K=v …]`` trusted-property block off an annotated message
    into a struct (msg, pid, uid, gid, comm, exe, cmdline) carrying
    the reference's CEE field set (imuxsock.c:963-1005 puts
    pid/uid/gid/appname/exe/cmd into the JSON root; appname = comm).
    cmdline is unquoted and unescaped. Messages without a block pass
    through with null properties. Pure Column — the annotate-at-
    ingest + parse-downstream split keeps the spool the byte-exact
    replay log while $! gets the same fields the reference injects."""
    import pyspark.sql.functions as F

    block = F.regexp_extract(msg, r" @\[(_PID=.*)\]$", 1)
    has = block != ""
    base = F.when(
        has, F.regexp_replace(msg, r" @\[_PID=.*\]$", "")
    ).otherwise(msg)

    def num(key: str) -> Column:
        v = F.regexp_extract(block, key + r"=(\d+)", 1)
        return F.when(has & (v != ""), v).cast("long")

    def plain(key: str) -> Column:
        v = F.regexp_extract(block, key + r"=([^ ]+)", 1)
        return F.when(has & (v != ""), v)

    quoted = F.regexp_extract(
        block, r'_CMDLINE="((?:[^"\\]|\\.)*)"', 1
    )
    cmdline = F.when(
        has & (quoted != ""),
        F.regexp_replace(quoted, r"\\(.)", "$1"),
    )
    return F.struct(
        base.alias("msg"),
        num("_PID").alias("pid"),
        num("_UID").alias("uid"),
        num("_GID").alias("gid"),
        plain("_COMM").alias("comm"),
        plain("_EXE").alias("exe"),
        cmdline.alias("cmdline"),
    )
