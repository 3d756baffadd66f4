"""Device parser fixups (pmciscoios / pmlastmsg / pmnull)."""

from __future__ import annotations

from rsyslog_spark.parsing import parse
from rsyslog_spark.parsing.devices import pmciscoios, pmlastmsg, pmnull


def _tok(spark, lines):
    return spark.createDataFrame(
        [(ln, [ord(c) for c in ln]) for ln in lines],
        "line string, tokens array<int>",
    )


def test_pmciscoios(spark):
    lines = [
        "<189>123: rtr1: *Mar  6 16:57:54: %SYS-5-CONFIG_I: Configured from console",
        "<189>77: .Jul  9 01:02:03.123: %LINK-3-UPDOWN: Interface up",
        "<38>Apr  4 03:06:12 gate sshd[1]: normal line",
    ]
    out = pmciscoios(parse(_tok(spark, lines))).collect()
    byline = {r.line: r for r in out}
    c1 = byline[lines[0]]
    assert c1.cisco_seq == 123 and c1.hostname == "rtr1"
    assert c1.programname == "%SYS-5-CONFIG_I"
    assert c1.msg == "Configured from console"
    assert c1.timereported_str == "Mar  6 16:57:54"
    c2 = byline[lines[1]]
    assert c2.cisco_seq == 77 and c2.programname == "%LINK-3-UPDOWN"
    n = byline[lines[2]]
    assert n.cisco_seq is None and n.programname == "sshd"


def test_pmlastmsg(spark):
    lines = [
        "<46>Nov  2 00:00:00 relay last message repeated 42 times",
        "<38>Apr  4 03:06:12 gate sshd[1]: normal",
    ]
    out = pmlastmsg(parse(_tok(spark, lines))).collect()
    byline = {r.line: r for r in out}
    assert byline[lines[0]].repeat_count == 42
    assert byline[lines[0]].msg.startswith("last message repeated")
    assert byline[lines[1]].repeat_count is None
    assert byline[lines[1]].syslogtag == "sshd[1]:"


def test_pmnull(spark):
    lines = ["<13>anything at all goes here"]
    out = pmnull(parse(_tok(spark, lines))).first()
    assert out.msg == "anything at all goes here"
    assert out.hostname is None and out.parse_success


def test_pmnormalize_promotes_fields(spark):
    """pmnormalize: rulebase-parsed raw line promotes well-known
    properties (pmnormalize.c:206-229 + msg.c msgSetPropViaJSON);
    unmatched rows fall through unchanged (COULD_NOT_PARSE)."""
    from rsyslog_spark import mm
    from rsyslog_spark.parsing.devices import pmnormalize

    # the reference fixture's shape (tests/testsuites/
    # pmnormalize_basic.rulebase): pri, hostname, tag, ipv4, rest
    rules = mm.load_rulebase(
        r"rule=:<%pri:number%> %hostname:word% %syslogtag:char-to:\x3a%: "
        r"is no longer listening on %peer:ipv4% %msg:rest%"
    )
    df = spark.createDataFrame(
        [
            ("<38> server1 sshd[42]: is no longer listening on "
             "10.0.0.7 port 22",),
            ("unparseable line",),
        ],
        "rawmsg string",
    )
    rows = pmnormalize(df, rules).collect()
    r = rows[0]
    assert r.pmn_matched
    assert r.pri == 38 and r.facility == 4 and r.severity == 6
    assert r.hostname == "server1" and r.syslogtag == "sshd[42]"
    assert r.programname == "sshd"
    assert r.msg == "port 22"
    assert r.norm["peer"] == "10.0.0.7"
    assert not rows[1].pmn_matched and rows[1].hostname is None
