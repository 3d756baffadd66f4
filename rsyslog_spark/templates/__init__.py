"""Template system: rsyslog templates compiled to one concat Column.

The reference's projection operator (/root/reference/runtime/template.c,
structs template.h:40-182): a template is a list of CONSTANT|FIELD
entries; each field is ``%prop:from:to:options%`` with substring /
field-extract (``F,<delimchar>``) / regex (``R,<ere>``) modes, date
formats, case conversion, and output escaping. Here every template
compiles to a single ``F.concat`` of built-in expressions → one
whole-stage-codegen'd projection (the Catalyst analog of rsyslog's
strgen compiled templates, tools/smtradfile.c).

Property names resolve through the rule compiler's Env, so templates
and filters share one property namespace.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.functions import parse_time
from rsyslog_spark.parsing.core import facility_text, severity_text
from rsyslog_spark.rules.compiler import Env

# built-in templates (reference: runtime/rsconf.c:203-260)
BUILTIN = {
    "RSYSLOG_FileFormat": (
        "%timereported:::date-rfc3339% %hostname% "
        "%syslogtag%%msg:::sp-if-no-1st-sp%%msg:::drop-last-lf%"
    ),
    "RSYSLOG_TraditionalFileFormat": (
        "%timereported% %hostname% "
        "%syslogtag%%msg:::sp-if-no-1st-sp%%msg:::drop-last-lf%"
    ),
    "RSYSLOG_ForwardFormat": (
        "<%pri%>%timereported:::date-rfc3339% %hostname% "
        "%syslogtag:1:32%%msg:::sp-if-no-1st-sp%%msg%"
    ),
    "RSYSLOG_TraditionalForwardFormat": (
        "<%pri%>%timereported% %hostname% "
        "%syslogtag:1:32%%msg:::sp-if-no-1st-sp%%msg%"
    ),
    "RSYSLOG_SyslogProtocol23Format": (
        "<%pri%>1 %timereported:::date-rfc3339% %hostname% %app-name% "
        "%procid% %msgid% %structured-data% %msg%"
    ),
    # JSON/DB output templates (rsconf.c:203-260). StdDBFmt is literally
    # SQL INSERT text in the reference — same here (sql escaping on msg).
    "RSYSLOG_StdJSONFmt": (
        '{"message":"%msg:::json%","fromhost":"%hostname:::json%",'
        '"facility":"%syslogfacility-text%","priority":"%syslogseverity-text%",'
        '"timereported":"%timereported:::date-rfc3339%"}'
    ),
    "RSYSLOG_StdDBFmt": (
        "insert into SystemEvents (Message, Facility, FromHost, "
        "SysLogTag) values ('%msg:::sql%', %syslogfacility%, "
        "'%hostname:::sql%', '%syslogtag:::sql%')"
    ),
}

_FIELD_RE = re.compile(r"%([^%]*)%")


def _resolve_prop(name: str, env: Env) -> Column:
    name = name.lower()
    if name in ("syslogfacility-text", "facility-text"):
        col, _ = env.resolve("$syslogfacility")
        return facility_text(col)
    if name in ("syslogseverity-text", "severity-text", "syslogpriority-text"):
        col, _ = env.resolve("$syslogseverity")
        return severity_text(col)
    if name == "pri-text":
        fac, _ = env.resolve("$syslogfacility")
        sev, _ = env.resolve("$syslogseverity")
        pri, _ = env.resolve("$pri")
        return F.concat(
            facility_text(fac), F.lit("."), severity_text(sev),
            F.lit("<"), pri.cast("string"), F.lit(">"),
        )
    col, _tag = env.resolve("$" + name if not name.startswith("$") else name)
    return col.cast("string")


def _apply_date_opt(col: Column, opt: str) -> Column:
    """Date options operate on the reported-time string; 3164-style
    strings are first parsed (year-estimated) via parse_time."""
    ts = F.from_unixtime(parse_time(col)).cast("timestamp")
    m = {
        "date-rfc3339": lambda: F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ssXXX"),
        "date-rfc3164": lambda: F.concat(
            F.date_format(ts, "MMM"),
            F.format_string("%3d", F.dayofmonth(ts)),
            F.lit(" "),
            F.date_format(ts, "HH:mm:ss"),
        ),
        "date-unixtimestamp": lambda: F.unix_timestamp(ts).cast("string"),
        "date-year": lambda: F.date_format(ts, "yyyy"),
        "date-month": lambda: F.date_format(ts, "MM"),
        "date-day": lambda: F.date_format(ts, "dd"),
        "date-hour": lambda: F.date_format(ts, "HH"),
        "date-minute": lambda: F.date_format(ts, "mm"),
        "date-second": lambda: F.date_format(ts, "ss"),
        "date-wday": lambda: (F.dayofweek(ts) - 1).cast("string"),
        "date-mysql": lambda: F.date_format(ts, "yyyyMMddHHmmss"),
        "date-pgsql": lambda: F.date_format(ts, "yyyy-MM-dd HH:mm:ss"),
        "date-ordinal": lambda: F.date_format(ts, "DDD"),
        "date-week": lambda: F.weekofyear(ts).cast("string"),
        "date-isoweek": lambda: F.weekofyear(ts).cast("string"),
        "date-isoweekyear": lambda: F.date_format(ts, "YYYY"),
        "date-wdayname": lambda: F.date_format(ts, "EEE"),
        "date-tzoffshour": lambda: F.date_format(ts, "xx").substr(1, 3),
        "date-tzoffsmin": lambda: F.date_format(ts, "xx").substr(4, 2),
        "date-tzoffsdirection": lambda: F.date_format(ts, "xx").substr(1, 1),
        "date-subseconds": lambda: F.date_format(ts, "S"),
        "date-secfrac": lambda: F.date_format(ts, "SSS"),
    }
    if opt not in m:
        raise ValueError(f"unsupported date option {opt!r}")
    return m[opt]()


def _csv_escape(col: Column) -> Column:
    """RFC4180 (template.h:160): always quote, double inner quotes."""
    return F.concat(
        F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"')
    )


def _json_escape(col: Column) -> Column:
    # to_json on a struct emits {"x":"<escaped>"}; strip the wrapper to
    # reuse Spark's JVM-side JSON escaping rather than regex chains
    j = F.to_json(F.struct(col.alias("x")))
    return F.regexp_extract(j, r'^\{"x":"(.*)"\}$', 1)


def compile_field(spec: str, env: Env) -> Column:
    """Compile one %...% field spec."""
    parts = spec.split(":")
    prop = parts[0]
    frm = parts[1] if len(parts) > 1 else ""
    to = parts[2] if len(parts) > 2 else ""
    opts = [o for o in (parts[3] if len(parts) > 3 else "").split(",") if o]

    col = _resolve_prop(prop, env)

    if frm.startswith("F"):  # field mode: F[,<delim-decimal>] ; to = field#
        delim = chr(int(frm.split(",")[1])) if "," in frm else "\t"
        # miss → '***FIELD NOT FOUND***' handled by functions.field
        from rsyslog_spark.functions import field as field_fn

        col = field_fn(col, delim, int(to))
    elif frm.startswith("R"):  # regex mode: R,<ere> (simplified)
        pattern = spec.split(",", 1)[1].rsplit("--end", 1)[0].rstrip(":")
        got = F.regexp_extract(col, pattern, 0)
        col = F.when(got != "", got).otherwise(F.lit("**NO MATCH**"))
    elif frm:
        # substring: from:to are 1-based char positions, inclusive
        f_i, t_i = int(frm), int(to) if to else None
        col = col.substr(F.lit(f_i), F.lit((t_i - f_i + 1) if t_i else 2**31 - 1))

    for opt in opts:
        if opt.startswith("date-"):
            col = _apply_date_opt(col, opt)
        elif opt == "lowercase":
            col = F.lower(col)
        elif opt == "uppercase":
            col = F.upper(col)
        elif opt == "csv":
            col = _csv_escape(col)
        elif opt == "json":
            col = _json_escape(col)
        elif opt == "jsonf":
            # name/value pair emission (template.h:170-178)
            col = F.concat(
                F.lit(f'"{prop}":"'), _json_escape(col), F.lit('"')
            )
        elif opt in ("sql", "stdsql"):
            # MySQL-style escaping (template.h:50-55): quote ' and \
            col = F.regexp_replace(
                F.regexp_replace(col, r"\\", r"\\\\"), "'", "''"
            )
        elif opt == "drop-last-lf":
            col = F.regexp_replace(col, r"\n$", "")
        elif opt == "sp-if-no-1st-sp":
            # emit a single space unless the value already starts with one
            # (template.h:157) — note: emits ONLY the conditional space
            col = F.when(col.startswith(" "), F.lit("")).otherwise(F.lit(" "))
        elif opt == "compressspace":
            col = F.regexp_replace(col, r"  +", " ")
        elif opt == "drop-cc":
            col = F.regexp_replace(col, r"[\x00-\x1f\x7f]", "")
        elif opt == "space-cc":
            col = F.regexp_replace(col, r"[\x00-\x1f\x7f]", " ")
        else:
            raise ValueError(f"unsupported template option {opt!r}")
    return F.coalesce(col, F.lit(""))


def compile_template(tpl: str, env: Env | None = None) -> Column:
    """Template string → single Column (concat of parts)."""
    env = env or Env()
    tpl = BUILTIN.get(tpl, tpl)
    parts: list[Column] = []
    pos = 0
    for m in _FIELD_RE.finditer(tpl):
        if m.start() > pos:
            parts.append(F.lit(tpl[pos : m.start()]))
        parts.append(compile_field(m.group(1), env))
        pos = m.end()
    if pos < len(tpl):
        parts.append(F.lit(tpl[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)
