"""imkmsg / imtuxedoulog / imbatchreport (rsyslog_spark.sources_os)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rsyslog_spark import sources_os as so


# ---------------------------------------------------------------------------
# imkmsg
# ---------------------------------------------------------------------------

KMSG_RECORDS = [
    # plain record
    "6,339,5140900,-;NET: Registered protocol family 10",
    # continuation properties (one leading space each, kmsg.c:133-160)
    "30,340,5690716,-;udevd[80]: starting version 181\n"
    " SUBSYSTEM=usb\n DEVICE=b1:2",
    # flags field variants are skipped up to the ';'
    "3,341,6000000,c,extra;oops",
    # invalid: no ';'
    "6,342,6100000,-",
    # invalid: missing comma after pri
    "6;naked",
]


def _kmsg_df(spark):
    return spark.createDataFrame(
        [(r,) for r in KMSG_RECORDS], "record string"
    )


def test_kmsg_parse(spark):
    out = so.kmsg_parse(_kmsg_df(spark)).orderBy("sequnum").collect()
    ok = [r for r in out if r.kmsg_valid]
    assert len(ok) == 3
    r0 = ok[0]
    assert (r0.pri, r0.facility, r0.severity) == (6, 0, 6)
    assert r0.sequnum == 339
    assert r0.usec_since_boot == 5140900
    assert r0.msg == "NET: Registered protocol family 10"
    assert r0.props == {}

    r1 = ok[1]
    assert r1.pri == 30 and r1.facility == 3 and r1.severity == 6
    assert r1.msg == "udevd[80]: starting version 181"
    assert r1.props == {"SUBSYSTEM": "usb", "DEVICE": "b1:2"}

    r2 = ok[2]
    assert r2.msg == "oops" and r2.pri == 3

    bad = [r for r in out if not r.kmsg_valid]
    assert len(bad) == 2
    assert all(r.msg is None and r.pri is None for r in bad)


def test_kmsg_timestamp(spark):
    df = so.kmsg_parse(_kmsg_df(spark)).where("kmsg_valid")
    df = df.withColumn(
        "boot_time", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    out = so.kmsg_timestamp(df).orderBy("sequnum").collect()
    assert str(out[0].ts) == "2024-01-01 00:00:05.140900"
    assert str(out[1].ts) == "2024-01-01 00:00:05.690716"


# ---------------------------------------------------------------------------
# imtuxedoulog — the four README cases + a Java stack-trace line
# ---------------------------------------------------------------------------

ULOG_LINES = [
    # case 1: 2-digit fraction
    "105211.70.sic-in2-tmsl1!IMSproxiCSFI4EC.26607818.1.0: "
    "TSAM_CAT:305:4563628752 ; I ;TPSUCCESS service",
    # case 2: 3-digit fraction
    "011458.705.sic-tst-tmsl1!LMS.5243392.772.3: "
    "TSAM_CAT:305: WARN: (23498) times logon TSAM Plus manager",
    # case 3: ECID
    "105211.704.sic-in2-tmsl1!IMSproxiCSFI4EC.26607818.1.0: "
    "ECID <000003GBORvD4iopwSXBiW01xG2M00001n>: 4563628752",
    # case 4: gtrid then ECID
    "164313.151.sic-tst-tmsm1!ARTIMPP_UDB.42722.1.0: "
    "gtrid x0 x4edeb6 xa0f: ECID <000001833^5pVl3iY00f003UF^>: TRACE:at",
    # Java exception line → ignored
    "\tat com.example.Foo.bar(Foo.java:42)",
]


def _ulog_df(spark):
    return spark.createDataFrame([(s,) for s in ULOG_LINES], "line string")


def test_ulog_parse_cases(spark):
    out = so.ulog_parse(_ulog_df(spark), tag="tux").collect()
    c1, c2, c3, c4, java = out

    assert c1.ulog_valid
    assert c1.hostname == "sic-in2-tmsl1"
    # PROCID: last dot-component trimmed (imtuxedoulog.c:parseMsg)
    assert c1.procid == "IMSproxiCSFI4EC.26607818.1"
    assert c1.timereported_str == "10:52:11.70"
    assert c1.secfrac_precision == 2
    assert c1.structured_data == "-"
    assert c1.msg == "TSAM_CAT:305:4563628752 ; I ;TPSUCCESS service"
    assert c1.syslogtag == "tux" and c1.programname == "tux"
    assert c1.pri == 14  # facility 1, severity 6 defaults

    assert c2.secfrac_precision == 3
    assert c2.timereported_str == "01:14:58.705"
    assert c2.procid == "LMS.5243392.772"
    assert c2.msg.startswith("TSAM_CAT:305: WARN:")

    assert c3.structured_data == (
        '[ECID="000003GBORvD4iopwSXBiW01xG2M00001n"]'
    )
    assert c3.msg == "4563628752"

    assert c4.structured_data == '[ECID="000001833^5pVl3iY00f003UF^"]'
    assert c4.msg == "TRACE:at"
    assert c4.hostname == "sic-tst-tmsm1"

    assert not java.ulog_valid and java.msg is None


def test_ulog_invalid_time(spark):
    df = spark.createDataFrame(
        [("256299.70.h!p: text",)], "line string"
    )  # hour 25 rejected (imtuxedoulog.c hour<=23 check)
    assert not so.ulog_parse(df).collect()[0].ulog_valid


# ---------------------------------------------------------------------------
# imbatchreport
# ---------------------------------------------------------------------------

def test_batch_report_transform(spark, tmp_path):
    report = (
        "job A   done\nstep  1\tok \n"
        '[queue="q1" END="1700000000" JOB="nightly"]  \n'
    )
    plain = "no structured data here\nline two"
    p1, p2 = tmp_path / "r1.ok", tmp_path / "r2.ok"
    p1.write_text(report)
    p2.write_text(plain)

    out = {
        r.filename: r
        for r in so.batch_reports(
            spark, str(tmp_path / "*.ok"),
            ts_key='END="', prog_key='JOB="',
        ).collect()
    }
    r1 = out["r1.ok"]
    assert r1.structured_data == '[queue="q1" END="1700000000" JOB="nightly"]'
    assert r1.ts_epoch == 1700000000
    assert r1.programname == "nightly"
    # space runs collapsed, trailing space dropped, \n escaped
    assert r1.msg == "job A done\\nstep 1 ok"
    assert not r1.too_large

    r2 = out["r2.ok"]
    assert r2.structured_data == "-"
    assert r2.msg == "no structured data here\\nline two"
    assert r2.ts_epoch is None and r2.programname is None


def test_batch_report_sd_newline_removed(spark, tmp_path):
    (tmp_path / "r.ok").write_text('body\n[k="v"\nmore="x"]\n')
    r = so.batch_reports(spark, str(tmp_path / "*.ok")).collect()[0]
    assert r.structured_data == '[k="v"more="x"]'
    assert r.msg == "body"


def test_batch_report_too_large(spark, tmp_path):
    (tmp_path / "big.ok").write_text("x" * 100)
    r = so.batch_reports(
        spark, str(tmp_path / "*.ok"), max_msg_size=10
    ).collect()[0]
    assert r.too_large
    assert r.msg.startswith("File too large : ")
    assert r.msg.endswith("big.ok")


def test_batch_report_no_dedup(spark, tmp_path):
    (tmp_path / "r.ok").write_text("a  b\tc\n")
    r = so.batch_reports(
        spark, str(tmp_path / "*.ok"), dedup_space=False
    ).collect()[0]
    assert r.msg == "a  b c"


def test_finalize_rename_delete(tmp_path):
    a, b, c = (tmp_path / n for n in ("a.ok", "b.ok", "c.ok"))
    for p in (a, b, c):
        p.write_text("x")
    pairs = so.finalize_batch_reports(
        [str(a), str(b)],
        rename_suffix_re=r"\.ok$", rename_to=".sent",
        reject_to=".rejected", rejected={str(b)},
    )
    assert dict(pairs) == {
        str(a): str(tmp_path / "a.sent"),
        str(b): str(tmp_path / "b.rejected"),
    }
    assert os.path.exists(tmp_path / "a.sent")
    assert os.path.exists(tmp_path / "b.rejected")

    so.finalize_batch_reports([str(c)], delete=True)
    assert not c.exists()

    # a rename that does not change the name must stop the poller
    (tmp_path / "d.ok").write_text("x")
    with pytest.raises(RuntimeError):
        so.finalize_batch_reports(
            [str(tmp_path / "d.ok")],
            rename_suffix_re=r"\.nope$", rename_to=".sent",
        )


# ---------------------------------------------------------------------------
# imjournal
# ---------------------------------------------------------------------------

JOURNAL_ENTRIES = [
    # full entry
    "MESSAGE=unit started\nPRIORITY=3\nSYSLOG_FACILITY=10\n"
    "SYSLOG_IDENTIFIER=sshd\nSYSLOG_PID=901\n"
    "__REALTIME_TIMESTAMP=1700000000123456\n_HOSTNAME=remote1",
    # _COMM fallback, _PID fallback, 1-char facility
    "MESSAGE=m2\nPRIORITY=6\nSYSLOG_FACILITY=4\n_COMM=cron\n_PID=77\n"
    "__REALTIME_TIMESTAMP=1700000001000000",
    # defaults: out-of-bounds priority, facility >23, no identifier
    "MESSAGE=m3\nPRIORITY=9\nSYSLOG_FACILITY=42\n"
    "__REALTIME_TIMESTAMP=1700000002000000",
    # non-numeric priority, odd-length facility, no pid
    "MESSAGE=m4\nPRIORITY=high\nSYSLOG_FACILITY=123\nSYSLOG_IDENTIFIER=x",
    # invalid: no MESSAGE
    "PRIORITY=3\nSYSLOG_IDENTIFIER=ghost",
]


def test_journal_entry_parse(spark):
    df = spark.createDataFrame(
        [(r,) for r in JOURNAL_ENTRIES], "record string"
    )
    out = so.journal_entry_parse(df, local_hostname="lh").collect()
    e1, e2, e3, e4, bad = out

    assert e1.journal_valid
    assert e1.msg == "unit started"
    assert (e1.severity, e1.facility, e1.pri) == (3, 10, 83)
    assert e1.syslogtag == "sshd[901]:"
    assert e1.programname == "sshd" and e1.procid == "901"
    # hostname is the LOCAL host, not _HOSTNAME (imjournal.c:542)
    assert e1.hostname == "lh"
    assert e1.ts_usec == 1700000000123456
    assert str(e1.ts) == "2023-11-14 22:13:20.123456"
    assert e1.journal["_HOSTNAME"] == "remote1"

    assert e2.syslogtag == "cron[77]:" and e2.facility == 4

    # out-of-bounds → defaults (sev 5, fac 1)
    assert (e3.severity, e3.facility) == (5, 1)
    assert e3.syslogtag == "journal:"

    assert (e4.severity, e4.facility) == (5, 1)
    assert e4.syslogtag == "x:" and e4.procid is None

    assert not bad.journal_valid and bad.msg is None


def test_journal_facility_digit_math(spark):
    # the reference parses facility DIGIT-WISE without isdigit checks:
    # 'A' -> 17 (in bounds, kept); 'Z' -> 42 (out, default)
    df = spark.createDataFrame(
        [("MESSAGE=m\nSYSLOG_FACILITY=A",),
         ("MESSAGE=m\nSYSLOG_FACILITY=Z",)],
        "record string",
    )
    out = so.journal_entry_parse(df).collect()
    assert out[0].facility == 17
    assert out[1].facility == 1


def test_read_journal_export_binary(tmp_path):
    import struct

    payload = b"line one\nline two"
    blob = (
        b"MESSAGE\n" + struct.pack("<Q", len(payload)) + payload + b"\n"
        + b"PRIORITY=4\n\n"
        + b"MESSAGE=plain\n__REALTIME_TIMESTAMP=5\n\n"
    )
    p = tmp_path / "export.bin"
    p.write_bytes(blob)
    recs = so.read_journal_export(str(p))
    assert len(recs) == 2
    assert recs[0] == "MESSAGE=line one\nline two\nPRIORITY=4"
    assert recs[1] == "MESSAGE=plain\n__REALTIME_TIMESTAMP=5"
