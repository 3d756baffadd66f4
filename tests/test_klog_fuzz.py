"""Fuzz differential for sources_os.klog_parse: a pure-Python twin of
imklog's C semantics (bsd.c submitSyslog + imklog.c Syslog/parsePRI)
is the executable spec; the Column implementation must agree on every
generated line."""

import random

from rsyslog_spark.sources_os import klog_parse

LOG_MAXPRI = 191


def _parse_pri(s: str, i: int):
    """parsePRI (imklog.c:194-221): '<' digits '>' with the
    accumulate-while-<=191 loop. Returns (pri, next_i) or None."""
    if i >= len(s) or s[i] != "<" or i + 1 >= len(s) or not s[i + 1].isdigit():
        return None
    i += 1
    v = 0
    while i < len(s) and s[i].isdigit() and v <= LOG_MAXPRI:
        v = v * 10 + int(s[i])
        i += 1
    if i >= len(s) or s[i] != ">" or v > LOG_MAXPRI:
        return None
    return v, i + 1


def klog_twin(line: str, default_pri: int = 6,
              keep_kernel_stamp: bool = False):
    """Python mirror of the full line pipeline; returns the dict of
    expected output columns (ktime fields None when absent)."""
    buf = line
    ksecs = kusecs = None
    # bsd.c:70-140 — ts only if '>' within first 5 bytes then '['
    endpri = 1
    while endpri < 5 and endpri < len(buf) and buf[endpri] != ">":
        endpri += 1
    # NOTE: the C never checks byte 0 or that the prefix is digits —
    # only '>' within bytes 1..4 followed by '[' gates the timestamp
    if (endpri <= 4 and endpri < len(buf) and buf[endpri] == ">"
            and endpri + 1 < len(buf) and buf[endpri + 1] == "["):
        i = endpri + 2
        while i < len(buf) and buf[i] == " ":
            i += 1
        j = i
        while j < len(buf) and buf[j].isdigit():
            j += 1
        if j > i and j < len(buf) and buf[j] == ".":
            k = j + 1
            m = k
            while m < len(buf) and buf[m].isdigit():
                m += 1
            if m < len(buf) and buf[m] == "]":
                ksecs, kusecs = int(buf[i:j]), int(buf[k:m])
                if not keep_kernel_stamp:
                    buf = buf[:endpri + 1] + buf[m + 1:]
    # imklog.c Syslog():244-279
    pri = default_pri
    msg = buf
    sec = None
    if len(buf) > 3 and (buf[3] == "<" or (buf[3] == " "
                                           and len(buf) > 4
                                           and buf[4] == "<")):
        off = 3 if buf[3] == "<" else 4
        got = _parse_pri(buf, off)
        if got and 8 <= got[0] <= LOG_MAXPRI:
            sec = got
            pri, msg = got[0], buf[got[1]:]
    if sec is None:
        got = _parse_pri(buf, 0)
        if got:
            pri, msg = got[0], buf[got[1]:]
    return {
        "pri": pri, "facility": pri // 8, "severity": pri % 8,
        "msg": msg, "ksecs": ksecs, "kusecs": kusecs,
    }


def _gen_lines(rng, n):
    frags = ["<", ">", "[", "]", ".", " ", "kernel", "usb", "x",
             "1", "12", "6", "191", "192", "0191", "30", "5"]
    lines = []
    for _ in range(n):
        kind = rng.randrange(6)
        if kind == 0:  # well-formed with ts
            lines.append(
                f"<{rng.randrange(300)}>[{rng.randrange(10**6)}."
                f"{rng.randrange(10**6)}] msg {rng.randrange(100)}"
            )
        elif kind == 1:  # dual-pri shapes
            sp = " " if rng.random() < 0.5 else ""
            lines.append(
                f"<{rng.randrange(10)}>{sp}<{rng.randrange(300)}>body"
            )
        elif kind == 2:  # plain
            lines.append(f"plain text {rng.randrange(100)}")
        else:  # random fragment soup
            lines.append("".join(
                rng.choice(frags) for _ in range(rng.randrange(1, 12))
            ))
    return lines


def test_klog_fuzz_differential(spark):
    rng = random.Random(20260818)
    lines = _gen_lines(rng, 1500)
    for keep in (False, True):
        df = spark.createDataFrame(
            [(i, ln) for i, ln in enumerate(lines)],
            "id long, line string",
        )
        got = {
            r.id: r for r in klog_parse(
                df, permit_non_kernel=True, keep_kernel_stamp=keep
            ).collect()
        }
        for i, ln in enumerate(lines):
            exp = klog_twin(ln, keep_kernel_stamp=keep)
            g = got[i]
            actual = {
                "pri": g.pri, "facility": g.facility,
                "severity": g.severity, "msg": g.msg,
                "ksecs": g.ktime_secs, "kusecs": g.ktime_usecs,
            }
            assert actual == exp, f"line {ln!r} keep={keep}: " \
                f"{actual} != {exp}"
