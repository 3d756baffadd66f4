"""Device-specific parser fixups (the contrib pm* family).

The reference runs these as alternative parsers in a ruleset's parser
chain (first non-COULD_NOT_PARSE wins, runtime/parser.c:613-686). Here
they are post-parse fixups: each detects its device dialect on the
already-decoded line and overrides the header columns for matching
rows — a `when(matches, fixed).otherwise(original)` projection, so the
chain stays one narrow stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Cisco IOS: <PRI>SEQ: [host: ]*TS: %FAC-SEV-MNEMONIC: text
# (plugins/pmciscoios/pmciscoios.c)
_CISCO_RE = (
    r"^(\d+): (?:([\w.-]+): )?[*.]?"
    r"((?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
    r" (?: \d|\d\d) \d{2}:\d{2}:\d{2}(?:\.\d+)?)(?: \w+)?: "
    r"(%[A-Z0-9_]+-\d-[A-Z0-9_]+): ?(.*)$"
)


def pmciscoios(df: DataFrame, raw_col: str = "rawmsg") -> DataFrame:
    """Recognize Cisco-IOS-framed lines and re-derive header fields:
    sequence number → cisco_seq, %FAC-SEV-MNEM → syslogtag/programname,
    device timestamp → timereported_str."""
    after = F.regexp_replace(F.col(raw_col), r"^<\d{1,3}>", "")
    groups = [F.regexp_extract(after, _CISCO_RE, i) for i in range(6)]
    hit = groups[0] != ""
    nullif = lambda c: F.when(c != "", c)  # noqa: E731
    return (
        df.withColumn("cisco_seq", F.when(hit, groups[1].cast("long")))
        .withColumn(
            "hostname",
            F.when(hit, F.coalesce(nullif(groups[2]), F.col("hostname")))
            .otherwise(F.col("hostname")),
        )
        .withColumn(
            "timereported_str",
            F.when(hit, groups[3]).otherwise(F.col("timereported_str")),
        )
        .withColumn(
            "syslogtag",
            F.when(hit, F.concat(groups[4], F.lit(":"))).otherwise(
                F.col("syslogtag")
            ),
        )
        .withColumn(
            "programname",
            F.when(hit, groups[4]).otherwise(F.col("programname")),
        )
        .withColumn("msg", F.when(hit, groups[5]).otherwise(F.col("msg")))
        .withColumn(
            "parse_success",
            F.when(hit, F.lit(True)).otherwise(F.col("parse_success")),
        )
    )


_LASTMSG = "last message repeated"


def pmlastmsg(df: DataFrame, raw_col: str = "rawmsg") -> DataFrame:
    """'last message repeated n times' lines (plugins/pmlastmsg): the
    whole remainder is MSG, no tag; repeat count extracted."""
    after = F.regexp_replace(F.col(raw_col), r"^<\d{1,3}>", "")
    # header (ts + host) may precede the phrase
    phrase_at = F.instr(after, _LASTMSG)
    hit = phrase_at > 0
    n = F.regexp_extract(
        after, r"last message repeated (\d+) times", 1
    )
    return (
        df.withColumn(
            "repeat_count", F.when(hit & (n != ""), n.cast("long"))
        )
        .withColumn(
            "msg",
            F.when(hit, after.substr(phrase_at, F.length(after))).otherwise(
                F.col("msg")
            ),
        )
        .withColumn(
            "syslogtag", F.when(~hit, F.col("syslogtag"))
        )
        .withColumn(
            "parse_success",
            F.when(hit, F.lit(True)).otherwise(F.col("parse_success")),
        )
    )


def pmnull(df: DataFrame, raw_col: str = "rawmsg") -> DataFrame:
    """plugins/pmnull: take everything after PRI as MSG, no header."""
    after = F.regexp_replace(F.col(raw_col), r"^<\d{1,3}>", "")
    return (
        df.withColumn("msg", after)
        .withColumn("hostname", F.lit(None).cast("string"))
        .withColumn("syslogtag", F.lit(None).cast("string"))
        .withColumn("timereported_str", F.lit(None).cast("string"))
        .withColumn("parse_success", F.lit(True))
    )


def parser_chain(df: DataFrame, fixups: list) -> DataFrame:
    """Apply device fixups in order (each only rewrites rows its
    dialect matches) — the parser-chain first-success analog collapsed
    into sequential conditional projections."""
    for fx in fixups:
        df = fx(df)
    return df


def pmnormalize(
    df: DataFrame,
    rules,
    raw_col: str = "rawmsg",
) -> DataFrame:
    """plugins/pmnormalize/pmnormalize.c:206-229: parse the RAW message
    through a liblognorm rulebase instead of the RFC parsers, then
    promote the extracted fields onto the message's well-known
    properties (MsgSetPropsViaJSON_Object → msg.c msgSetPropViaJSON:
    msg/hostname/syslogtag/pri/procid/msgid promote; everything else
    stays in the `norm` map). `pri` promotion re-derives
    facility/severity; programname is re-derived from a promoted tag.

    `rules` is a list of NormalizeRule (e.g. from mm.load_rulebase —
    the plugin's `rulebase` param). Rows no rule matches keep their
    original columns (COULD_NOT_PARSE → next parser in the chain);
    ``pmn_matched`` records the outcome."""
    from rsyslog_spark import mm as _mm

    out = _mm.mmnormalize(
        df, rules, msg_col=raw_col, out_col="_pmn", rule_col="_pmn_rule"
    )
    matched = F.col("_pmn_rule") >= 0
    got = lambda k: F.try_element_at("_pmn", F.lit(k))  # noqa: E731

    def promote(col_name: str, key: str, cast: str | None = None):
        nonlocal out
        if col_name not in out.columns:
            out = out.withColumn(col_name, F.lit(None).cast(cast or "string"))
        val = got(key)
        if cast:
            val = val.try_cast(cast)
        out = out.withColumn(
            col_name,
            F.when(matched & val.isNotNull(), val).otherwise(
                F.col(col_name)
            ),
        )

    promote("msg", "msg")
    promote("hostname", "hostname")
    promote("syslogtag", "syslogtag")
    promote("procid", "procid")
    promote("msgid", "msgid")
    promote("pri", "pri", "int")
    pri_val = got("pri").try_cast("int")
    has_pri = matched & pri_val.isNotNull()
    for name, expr in (
        ("facility", (pri_val / 8).cast("int")),
        ("severity", pri_val % 8),
    ):
        if name not in out.columns:
            out = out.withColumn(name, F.lit(None).cast("int"))
        out = out.withColumn(
            name, F.when(has_pri, expr).otherwise(F.col(name))
        )
    tag = got("syslogtag")
    has_tag = matched & tag.isNotNull()
    if "programname" not in out.columns:
        out = out.withColumn("programname", F.lit(None).cast("string"))
    out = out.withColumn(
        "programname",
        F.when(has_tag, F.regexp_extract(tag, r"^([^:\[ ]*)", 1)).otherwise(
            F.col("programname")
        ),
    )
    return (
        out.withColumn("pmn_matched", matched)
        .withColumn("norm", F.col("_pmn"))
        .drop("_pmn", "_pmn_rule")
    )
