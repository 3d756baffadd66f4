"""JVM-side (whole-stage-codegen) decode + syslog header parse.

Semantics mirrored from the reference (cited per step):

- PRI parse: ``<0..191>`` → facility = pri>>3, severity = pri&7;
  missing PRI → default 13; malformed → invalid.
  (/root/reference/runtime/parser.c:543-605)
- RFC3164 heuristic header: TIMESTAMP SP HOSTNAME SP TAG MSG, where TAG
  runs until ':' (kept in tag) or SP (left in msg).
  (/root/reference/tools/pmrfc3164.c:295-516)
- RFC5424: ``<PRI>1 TS HOST APP PROCID MSGID SD MSG``.
  (/root/reference/tools/pmrfc5424.c:75-185)
- PROGNAME = TAG up to first ':' / '[' / SP
  (/root/reference/runtime/msg.c getProgramName, msg.h:279)

The decode fast path (``char()`` join) is exact for token values
< 128 (ASCII); the corpus generator guarantees this. Non-ASCII code
points require ``parse(df, mode="full")``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# syslog facility/severity names, reference: runtime/msg.c syslog_fac_names /
# syslog_severity_names tables (also tools/syslogd.c f_*names).
FACILITY_TEXT = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clock",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6",
    "local7",
]
SEVERITY_TEXT = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]

_MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"
# 'MMM dd' with space- or zero-padded day, then HH:MM:SS
TS3164_RE = rf"(?:{_MONTHS}) (?: \d|\d\d) \d{{2}}:\d{{2}}:\d{{2}}"
# RFC3339/5424 timestamp (with optional frac + zone)
TS3339_RE = (
    r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})?"
)

# full-line regexes; group numbers documented inline
_RE_PRI = r"^<(\d{1,3})>"
# after-PRI RFC3164:  (ts) SP (host) SP (tag[':' kept]) (msg)
_RE_3164 = rf"^({TS3164_RE}) (\S+) ([^: ]*:?)(.*)$"
# after-PRI RFC5424: 1 SP ts SP host SP app SP procid SP msgid SP sd SP msg
_RE_5424 = r"^1 (\S+) (\S+) (\S+) (\S+) (\S+) (-|\[.*\])(?: (.*))?$"


def decode_tokens(tokens: Column | str) -> Column:
    """array<int> code points → string (JVM-side; exact for ASCII)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.array_join(F.transform(c, lambda t: F.char(t)), "")


def facility_text(fac: Column) -> Column:
    """facility int → name (element_at is 1-indexed)."""
    return F.try_element_at(
        F.array(*[F.lit(x) for x in FACILITY_TEXT]), fac.cast("int") + 1
    )


def severity_text(sev: Column) -> Column:
    return F.try_element_at(
        F.array(*[F.lit(x) for x in SEVERITY_TEXT]), sev.cast("int") + 1
    )


def parse_sql(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Append parsed header columns using only built-in expressions.

    One narrow projection stage: no shuffle, no Python, fully
    whole-stage-codegen'd; Catalyst prunes any of these columns the
    downstream plan does not use.
    """
    raw = decode_tokens(tokens_col)
    df = df.withColumn("rawmsg", raw)

    pri_str = F.regexp_extract("rawmsg", _RE_PRI, 1)
    has_pri = pri_str != ""
    pri_num = F.when(has_pri, pri_str.cast("int")).otherwise(F.lit(13))
    pri_valid = pri_num <= 191
    # after-PRI remainder (rawmsg-after-pri property, msg.h:71)
    pri_frame_len = F.length(F.regexp_extract("rawmsg", _RE_PRI, 0))
    after_pri = F.when(
        has_pri,
        F.col("rawmsg").substr(pri_frame_len + 1, F.length("rawmsg")),
    ).otherwise(F.col("rawmsg"))

    df = (
        df.withColumn("pri", F.when(pri_valid, pri_num))
        .withColumn("_after_pri", after_pri)
    )
    df = df.withColumn("facility", (F.col("pri") / 8).cast("int")).withColumn(
        "severity", F.col("pri") % 8
    )

    is5424 = F.col("_after_pri").startswith("1 ")
    df = df.withColumn(
        "protocol_version", F.when(is5424, F.lit(1)).otherwise(F.lit(0))
    )

    g3164 = [F.regexp_extract("_after_pri", _RE_3164, i) for i in range(5)]
    g5424 = [F.regexp_extract("_after_pri", _RE_5424, i) for i in range(8)]
    ok3164 = g3164[0] != ""
    ok5424 = g5424[0] != ""

    nullif = lambda c: F.when(c != "", c)  # noqa: E731
    dash_null = lambda c: F.when((c != "") & (c != "-"), c)  # noqa: E731

    df = (
        df.withColumn(
            "timereported_str",
            F.when(is5424, nullif(g5424[1])).otherwise(nullif(g3164[1])),
        )
        .withColumn(
            "hostname",
            F.when(is5424, nullif(g5424[2])).otherwise(nullif(g3164[2])),
        )
        .withColumn(
            "syslogtag",
            F.when(is5424, nullif(g5424[3])).otherwise(nullif(g3164[3])),
        )
        .withColumn("procid", F.when(is5424, dash_null(g5424[4])))
        .withColumn("msgid", F.when(is5424, dash_null(g5424[5])))
        .withColumn("structured_data", F.when(is5424, nullif(g5424[6])))
        .withColumn(
            "msg", F.when(is5424, g5424[7]).otherwise(g3164[4])
        )
        .withColumn(
            "parse_success",
            F.when(is5424, ok5424).otherwise(ok3164) & pri_valid,
        )
        .withColumn(
            "programname",
            F.regexp_extract("syslogtag", r"^([^:\[ ]*)", 1),
        )
        .drop("_after_pri")
    )
    return df
