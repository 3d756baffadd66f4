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
