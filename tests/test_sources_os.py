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
