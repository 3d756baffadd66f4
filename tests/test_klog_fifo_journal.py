"""imklog line semantics, imfifo named-pipe source, omjournal
export-format writer round trips."""

import os
import time

from rsyslog_spark.sources_os import (
    FifoSource,
    journal_entry_parse,
    klog_parse,
    read_journal_export,
)
from rsyslog_spark.sinks import (
    journal_export_entry,
    journal_export_write,
    omjournal_fields,
)


def _klog(spark, lines, **kw):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)],
                               "id long, line string")
    return {r.id: r for r in klog_parse(df, **kw).collect()}


def test_klog_kernel_timestamp_and_pri(spark):
    out = _klog(spark, [
        "<6>[12345.678901] usb 1-1: new device",   # ts + kern.info
        "<6> [1.2] no-ts (space before bracket)",  # '[' not adjacent
        "plain text no pri",                       # default pri
        "<200>overflow pri",                       # >191 -> default
    ])
    r = out[0]
    assert (r.pri, r.facility, r.severity) == (6, 0, 6)
    assert r.ktime_secs == 12345 and r.ktime_usecs == 678901
    assert r.msg == " usb 1-1: new device"        # bracket stripped
    assert r.syslogtag == "kernel:"
    r = out[1]
    assert r.ktime_secs is None
    assert r.msg == " [1.2] no-ts (space before bracket)"
    assert out[2].pri == 6 and out[2].msg == "plain text no pri"
    assert out[3].pri == 6 and out[3].msg == "<200>overflow pri"
    # parsePRI's digit loop accepts leading zeros (0->1->19->191)
    out = _klog(spark, ["<0191>leading zeros ok"], permit_non_kernel=True)
    assert out[0].pri == 191 and out[0].msg == "leading zeros ok"


def test_klog_keep_stamp_and_nonkernel_filter(spark):
    # 191 -> facility 23: dropped unless permit_non_kernel
    out = _klog(spark, ["<0191>x"])
    assert 0 not in out
    out = _klog(spark, ["<0191>x"], permit_non_kernel=True)
    assert out[0].facility == 23
    # keep_kernel_stamp leaves the bracket in the message
    out = _klog(spark, ["<6>[99.5] hi"], keep_kernel_stamp=True)
    assert out[0].msg == "[99.5] hi" and out[0].ktime_secs == 99


def test_klog_dual_pri(spark):
    out = _klog(spark, [
        "<6><30>systemd says",      # offset-3 '<', pri2 30 = daemon.info
        "<6> <34>spaced form",      # offset-3 ' ', offset-4 '<'
        "<6><5>too-low second pri",  # pri2 < 8 -> leading PRI wins
    ], permit_non_kernel=True)
    assert out[0].pri == 30 and out[0].msg == "systemd says"
    assert out[1].pri == 34 and out[1].msg == "spaced form"
    assert out[2].pri == 6 and out[2].msg == "<5>too-low second pri"


def test_fifo_source_lines_and_truncation(tmp_path, spark):
    path = str(tmp_path / "pipe")
    spool = str(tmp_path / "spool")
    os.mkfifo(path)
    src = FifoSource(path, spool, max_line=10)
    try:
        fd = os.open(path, os.O_WRONLY)
        os.write(fd, b"hello\n")
        os.write(fd, b"this line is far too long for ten\n")
        os.write(fd, b"ok\n")
        os.close(fd)
        deadline = time.time() + 5
        while src.n_messages < 3 and time.time() < deadline:
            time.sleep(0.05)
        assert src.n_messages == 3
    finally:
        src.close()
    rows = [r.value for r in spark.read.text(spool).collect()]
    assert sorted(rows) == sorted(["hello", "this line ", "ok"])


def test_fifo_rejects_regular_file(tmp_path):
    p = tmp_path / "regular"
    p.write_text("x")
    import pytest

    with pytest.raises(ValueError, match="not a named pipe"):
        FifoSource(str(p), str(tmp_path / "s"))


def test_omjournal_default_mapping_round_trip(spark):
    df = spark.createDataFrame(
        [(1, "disk full", 0, 2, "kernel:"),
         (2, "login ok", 4, 6, "sshd[42]:")],
        "id long, msg string, facility long, severity long, "
        "syslogtag string",
    )
    entry = journal_export_entry(omjournal_fields(df))
    rows = df.select("id", entry.alias("record")).orderBy("id")
    # feed the rendered entries straight back through imjournal's parse
    parsed = {
        r.id: r for r in journal_entry_parse(rows).collect()
    }
    assert parsed[1].msg == "disk full"
    assert parsed[1].pri == 2 and parsed[1].facility == 0
    assert parsed[1].syslogtag == "kernel:"
    # reference asymmetry, mirrored: omjournal writes the FULL PRI
    # into PRIORITY (omjournal.c:300) but imjournal only accepts 0..7
    # there (imjournal.c:613-653) — so severity falls back to the
    # default (5) while SYSLOG_FACILITY carries facility fine
    assert parsed[2].facility == 4 and parsed[2].severity == 5
    assert parsed[2].pri == 37 and parsed[2].programname == "sshd[42]"
    # template mode: field set verbatim
    ent2 = journal_export_entry(
        omjournal_fields(df, template_cols={"MESSAGE": "msg",
                                            "UNIT": "syslogtag"})
    )
    txt = df.where("id = 1").select(ent2).collect()[0][0]
    assert txt == "MESSAGE=disk full\nUNIT=kernel:\n\n"


def test_journal_export_write_binary_round_trip(tmp_path):
    entries = [
        {"MESSAGE": "plain", "PRIORITY": "6"},
        {"MESSAGE": "two\nlines", "DATA": b"\x00\x01\xff"},
    ]
    p = tmp_path / "export.bin"
    p.write_bytes(journal_export_write(entries))
    recs = read_journal_export(str(p))
    assert len(recs) == 2
    assert "MESSAGE=plain" in recs[0]
    # binary form survives the round trip (reader re-linearizes)
    assert "MESSAGE=two\nlines" in recs[1] or "two" in recs[1]


def test_fifo_carry_across_chunks(tmp_path):
    """Partial line split across writes assembles once; truncation
    still drops (not splits) past max_line."""
    path = str(tmp_path / "pipe2")
    spool = str(tmp_path / "spool2")
    os.mkfifo(path)
    src = FifoSource(path, spool, max_line=20)
    try:
        fd = os.open(path, os.O_WRONLY)
        os.write(fd, b"first-ha")
        time.sleep(0.3)
        os.write(fd, b"lf\nsecond\n")
        os.write(fd, b"L" * 50)
        time.sleep(0.3)
        os.write(fd, b"tail\nlast\n")
        os.close(fd)
        deadline = time.time() + 5
        while src.n_messages < 4 and time.time() < deadline:
            time.sleep(0.05)
        assert src.n_messages == 4
    finally:
        src.close()
    lines = []
    for name in sorted(os.listdir(spool)):
        with open(os.path.join(spool, name), "rb") as fh:
            lines += fh.read().decode().splitlines()
    assert lines == ["first-half", "second", "L" * 20, "last"]
